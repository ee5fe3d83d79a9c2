"""URL column helpers: domain, extension, blocklist.

Reference semantics:

* domain: ``urlparse(url).netloc.lower().replace("www.","")``
  (/root/reference/utils.py:6-8).  Note the reference strips *any*
  "www." occurrence; we implement the saner leading-"www." strip and
  unify api/main.py:40-41's non-lowercased variant onto this one
  (SURVEY.md §2A P1/P10).
* ext: query-string stripped, lowercased suffix (crawler_core.py:27-30).
* static extension blocklist (crawler_core.py:15-24).

All JVM regexp expressions — codegen-friendly, pushdown-compatible when
used in filters over a derived column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: crawler_core.py:15-20 — the 24 static asset extensions the crawler
#: skips (STATIC_EXTENSIONS), ported verbatim: archives (.rar/.7z/.tar)
#: included — dropping them would fetch multi-GB dumps the reference
#: never touches.
BLOCKED_EXTS = (
    ".js .css .png .jpg .jpeg .gif .webp .ico .svg .woff .woff2 "
    ".ttf .eot .otf .mp4 .webm .avi .mov .mp3 .wav .zip .rar .7z .gz .tar"
).split()

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def domain_of(url: Column | str) -> Column:
    """Lowercased host with a leading www. stripped (utils.py:6-8)."""
    host = F.regexp_extract(F.lower(_c(url)), _HOST_RE, 1)
    return F.regexp_replace(host, r"^www\.", "")


def path_of(url: Column | str) -> Column:
    """URL path component (query/fragment stripped)."""
    return F.regexp_extract(_c(url), r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)


def ext_of(url: Column | str) -> Column:
    """Lowercased file extension with query string stripped
    (crawler_core.py:27-30): '.pdf' from 'https://x/a.PDF?dl=1'."""
    no_q = F.regexp_replace(_c(url), r"[?#].*$", "")
    return F.lower(F.regexp_extract(no_q, r"(\.[^./\\]+)$", 1))


def is_blocked_ext(url: Column | str) -> Column:
    """True when the URL's extension is on the static blocklist
    (crawler_core.py:15-24)."""
    return ext_of(url).isin(list(BLOCKED_EXTS))
