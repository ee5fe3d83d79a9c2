"""Invariant tests for the round-3 curation-tier queries — semantic
properties the oracle-parity hash check cannot see (parity proves both
engines agree, not that the shared definition is right)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_system_spark.catalog import table
from data_integration_system_spark.operators.joins import large_volume_orders
from data_integration_system_spark.operators.relational import event_zscore_outliers
from data_integration_system_spark.operators.textops import (
    exact_substring_dup_spans,
    pack_sequences,
    pii_redact,
    tokens_of,
    weighted_resample,
)

SF = "/root/testdata/sf0.001"


def test_pack_sequences_is_contiguous_and_in_bounds(spark):
    """The packing manifest must describe an exact concat-then-split:
    per lang, doc start offsets are the running sum of prior token
    counts, and every in-sequence offset is < the 512 budget."""
    pdf = pack_sequences(spark, SF).toPandas()
    assert (pdf.seq_off >= 0).all() and (pdf.seq_off < 512).all()
    for _, g in pdf.sort_values("doc_id").groupby("lang"):
        starts = (g.seq_id * 512 + g.seq_off).to_numpy()
        expect = g.n_tokens.cumsum().shift(1, fill_value=0).to_numpy()
        assert (starts == expect).all()


def test_pii_redact_counts_track_injection(spark):
    """Counts must reflect exactly the deterministic injected PII: every
    doc_id % 3 == 0 doc gains one email, % 5 == 0 one phone, and docs
    with no injection at all redact nothing (the base corpus is clean)."""
    pdf = pii_redact(spark, SF).toPandas().set_index("doc_id")
    for did, row in pdf.iterrows():
        assert row.n_emails == (1 if did % 3 == 0 else 0)
        assert row.n_phones == (1 if did % 5 == 0 else 0)
        assert row.n_ips == (1 if did % 4 == 0 else 0)


def test_dup_spans_bounded_by_positions(spark):
    """A doc with T tokens has exactly T-7 span positions, and duplicated
    positions can never exceed them."""
    spans = exact_substring_dup_spans(spark, SF)
    toks = table(spark, SF, "documents").select(
        "doc_id", F.size(tokens_of("text")).alias("n_toks")
    )
    bad = (
        spans.join(toks, "doc_id")
        .filter(
            (F.col("n_spans") != F.col("n_toks") - 7)
            | (F.col("n_dup_spans") > F.col("n_spans"))
        )
        .count()
    )
    assert bad == 0


def test_weighted_resample_rebalances_toward_uniform(spark):
    """The realized copy counts must move each (lang, source) group
    toward the uniform target share: every group's total copies lands
    within 50% of total/n_groups (deterministic LCG — no flake; at this
    SF groups are tiny, so the fractional-copy rounding is +/-1 on a
    target of ~5, hence the loose band)."""
    pdf = weighted_resample(spark, SF).toPandas()
    target = len(pdf) / pdf.groupby(["lang", "source"]).ngroups
    sums = pdf.groupby(["lang", "source"]).n_copies.sum()
    assert ((sums >= 0.5 * target) & (sums <= 1.5 * target)).all(), sums


def test_zscore_outliers_are_actually_extreme(spark):
    """Every flagged event is >= 3 sigma by the integer-scaled score, and
    flagging is rare (< 5% of events)."""
    out = event_zscore_outliers(spark, SF)
    assert out.filter((F.col("z_e3") < 3000) & (F.col("z_e3") > -3001)).count() == 0
    n_events = table(spark, SF, "events").count()
    assert out.count() < 0.05 * n_events


def test_large_volume_orders_threshold_and_order(spark):
    """Every reported order exceeds the volume threshold and rows arrive
    in (total_qty DESC, o_orderkey) order, at most 20 of them."""
    rows = large_volume_orders(spark, SF).collect()
    assert 0 < len(rows) <= 20
    assert all(r.total_qty > 250 for r in rows)
    keys = [(-r.total_qty, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)


def test_curate_corpus_end_to_end(spark, tmp_path):
    """The composed curation job: the committed snapshot must be exactly
    the intersection of the four stage survivor sets, the report must
    count every stage, and the curated count can exceed no stage's."""
    from data_integration_system_spark.operators.dedup import (
        dedup_corpus_keep_reps,
        dedup_exact_full,
    )
    from data_integration_system_spark.operators.textops import (
        decontaminate_filter,
        quality_filter_gopher,
    )
    from data_integration_system_spark.pipeline.curate import curate_corpus
    from data_integration_system_spark.pipeline.snapshots import read_current

    out = str(tmp_path / "curated")
    report = {r.stage: r.n_docs for r in curate_corpus(spark, SF, out).collect()}
    assert set(report) == {
        "corpus", "quality", "exact_dedup", "near_dedup",
        "decontaminated", "curated",
    }

    got = {r.doc_id for r in read_current(spark, out).select("doc_id").collect()}
    want = (
        {r.doc_id for r in quality_filter_gopher(spark, SF).filter("passes").collect()}
        & {r.doc_id for r in dedup_exact_full(spark, SF).collect()}
        & {r.doc_id for r in dedup_corpus_keep_reps(spark, SF).collect()}
        & {r.doc_id for r in decontaminate_filter(spark, SF).collect()}
    )
    assert got == want and len(got) > 0
    assert report["curated"] == len(got)
    assert all(
        report["curated"] <= report[s]
        for s in ("quality", "exact_dedup", "near_dedup", "decontaminated")
    )
    # curated output keeps full document payloads
    assert set(read_current(spark, out).columns) == {
        "doc_id", "text", "lang", "source", "n_chars",
    }


def test_curate_with_novelty_stage_and_jsonl_export(spark, tmp_path):
    """The optional novelty stage tightens the curation intersection
    (monotone: adding a stage can only shrink the output), its count
    lands in the audit report, and the curated snapshot exports as
    readable compressed JSONL with the same row count."""
    from data_integration_system_spark.pipeline.curate import (
        curate_corpus,
        export_jsonl,
    )
    from data_integration_system_spark.pipeline.snapshots import read_current

    base = str(tmp_path / "base")
    strict = str(tmp_path / "strict")
    plain = {r.stage: r.n_docs for r in curate_corpus(spark, SF, base).collect()}
    report = {
        r.stage: r.n_docs
        for r in curate_corpus(spark, SF, strict, min_novelty_e4=100).collect()
    }
    assert "novel" in report and "novel" not in plain
    assert report["novel"] <= report["corpus"]
    assert report["curated"] <= plain["curated"]

    out = str(tmp_path / "export")
    res = export_jsonl(spark, strict, out)
    assert res["written"] is True and res["rows"] == report["curated"]
    back = spark.read.json(res["path"])
    assert back.count() == res["rows"]
    assert "doc_id" in back.columns and "text" in back.columns

    # same-version re-export: idempotent no-op, not an error
    again = export_jsonl(spark, strict, out)
    assert again["written"] is False and again["path"] == res["path"]
    assert again["rows"] == res["rows"]

    # new snapshot version -> re-export to the SAME out_path lands in a
    # fresh versioned subdir (the advertised re-export contract)
    from data_integration_system_spark.pipeline.snapshots import (
        read_current,
        write_snapshot,
    )

    write_snapshot(read_current(spark, strict).limit(5), strict)
    res2 = export_jsonl(spark, strict, out)
    assert res2["written"] is True and res2["path"] != res["path"]
    assert res2["rows"] == 5

    # crashed-mid-write recovery (advisor r6): a version dir WITHOUT
    # _SUCCESS is a partial export — re-export must complete it, not
    # report the truncated row count as done
    import glob as _glob
    import os

    os.remove(f"{res2['path']}/_SUCCESS")
    parts = sorted(_glob.glob(f"{res2['path']}/part-*"))
    assert parts  # sanity: there is data to truncate
    os.remove(parts[0])
    res3 = export_jsonl(spark, strict, out)
    assert res3["written"] is True and res3["path"] == res2["path"]
    assert res3["rows"] == 5
    assert os.path.exists(f"{res3['path']}/_SUCCESS")
    assert spark.read.json(res3["path"]).count() == 5


def test_release_corpus_end_to_end(spark, tmp_path):
    """The release composition: curated snapshot + packing-manifest
    snapshot + JSONL export agree with each other — every curated doc
    has exactly one packing assignment, the export carries both text
    and assignment, and the report gains the sequences row."""
    from data_integration_system_spark.operators.textops import pack_relation
    from data_integration_system_spark.pipeline.curate import release_corpus
    from data_integration_system_spark.pipeline.snapshots import read_current

    root = str(tmp_path / "corpus")
    export = str(tmp_path / "export")
    report = {
        r.stage: r.n_docs
        for r in release_corpus(spark, SF, root, export_path=export).collect()
    }
    curated = read_current(spark, root)
    manifest = read_current(spark, root + "_manifest")
    assert manifest.count() == curated.count() == report["curated"]
    assert report["sequences"] >= 1
    # manifest is exactly pack_relation over the survivors
    want = {
        (r.doc_id, r.seq_id, r.seq_off)
        for r in pack_relation(curated.select("doc_id", "lang", "text")).collect()
    }
    got = {(r.doc_id, r.seq_id, r.seq_off) for r in manifest.collect()}
    assert got == want
    from data_integration_system_spark.pipeline.snapshots import current_version

    back = spark.read.json(f"{export}/{current_version(spark, root)}")
    assert back.count() == report["curated"]
    assert {"text", "seq_id", "seq_off", "n_tokens"} <= set(back.columns)


def test_append_fingerprint_index_matches_rebuild(spark, tmp_path):
    """Incremental fingerprint indexing: cold-start append of two halves
    equals one full build WITHOUT the stop-hash prune (appends can't see
    global document frequencies) — probing both indexes with the same
    query set returns identical overlap pairs when no fingerprint
    crosses the prune threshold."""
    from data_integration_system_spark.catalog import table as cat_table
    from data_integration_system_spark.operators.textops import (
        append_fingerprint_index,
        build_fingerprint_index,
        query_fingerprint_index,
    )
    from pyspark.sql import functions as F

    docs = cat_table(spark, SF, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    queries = docs.filter(F.col("doc_id") < 20)

    built = str(tmp_path / "built")
    appended = str(tmp_path / "appended")
    build_fingerprint_index(spark, SF, built, stop_docs=None)
    append_fingerprint_index(spark, appended, half_a)
    append_fingerprint_index(spark, appended, half_b)

    want = {
        (r.q_id, r.c_id, r.shared_fps)
        for r in query_fingerprint_index(spark, built, queries).collect()
    }
    got = {
        (r.q_id, r.c_id, r.shared_fps)
        for r in query_fingerprint_index(spark, appended, queries).collect()
    }
    assert got == want and len(want) > 0


def test_release_corpus_with_split_fencing(spark, tmp_path):
    """A release with split_weights fences every curated doc into
    exactly one deterministic split: the export carries the split
    column, the report's split rows sum to the curated count, and the
    assignment matches a direct assign_split replay (doc_id-keyed,
    salt-versioned)."""
    from data_integration_system_spark.functions.hashing import assign_split
    from data_integration_system_spark.pipeline.curate import release_corpus
    from data_integration_system_spark.pipeline.snapshots import (
        current_version,
        read_current,
    )

    root = str(tmp_path / "corpus")
    export = str(tmp_path / "export")
    weights = {"train": 9000, "val": 500, "test": 500}
    report = {
        r.stage: r.n_docs
        for r in release_corpus(
            spark, SF, root, export_path=export, split_weights=weights
        ).collect()
    }
    assert report["split:train"] + report["split:val"] + report["split:test"] == report["curated"]

    back = spark.read.json(f"{export}/{current_version(spark, root)}")
    assert "split" in back.columns
    assert back.count() == report["curated"]
    got = {r.doc_id: r.split for r in back.select("doc_id", "split").collect()}
    want = {
        r.doc_id: r.split
        for r in read_current(spark, root)
        .select("doc_id", assign_split("doc_id", weights, salt="release").alias("split"))
        .collect()
    }
    assert got == want


def _fake_word_tokenizer_factory():
    """Injected test tokenizer: whitespace words, each yielding TWO
    'tokens' — distinguishable from both the regex proxy and any real
    BPE, so the test proves the FACTORY's counts flow through.  Built
    as a lambda so cloudpickle ships it by VALUE (a module-level def in
    a test file pickles by reference and the Spark worker can't import
    tests/*)."""
    return lambda: (
        "fake_2x_words",
        lambda s: [w for w in s.split() for _ in (0, 1)],
    )


def test_token_counts_injected_tokenizer_contract(spark):
    """VERDICT r9 #7: the pluggable tokenizer stage runs the injected
    factory per partition and reports its counts + name per row —
    the full Spark plumbing (Arrow batches, schema, NULL text) without
    the real dependency, the render_fn_factory pattern for tokenizers."""
    from data_integration_system_spark.operators.tokenize import token_counts

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "one"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.tokenizer)
        for r in token_counts(df, tokenizer_factory=_fake_word_tokenizer_factory()).collect()
    }
    assert out == {
        1: (6, "fake_2x_words"),  # 3 words x 2
        2: (2, "fake_2x_words"),
        3: (0, "fake_2x_words"),  # NULL text counts 0, never raises
        4: (0, "fake_2x_words"),
    }


def test_token_counts_default_factory_falls_back_to_regex(spark):
    """This container has no tiktoken: the default factory must resolve
    to the documented regex proxy (identical counts to the
    token_count_bpe token classes), and the tokenizer column must say
    so — a silent fallback that still claims tiktoken would corrupt
    every budget downstream."""
    import importlib.util

    from data_integration_system_spark.operators.tokenize import (
        default_tokenizer_factory,
        token_counts,
    )

    assert importlib.util.find_spec("tiktoken") is None  # gate premise
    name, encode = default_tokenizer_factory()
    assert name == "regex_bpe_proxy"
    assert len(encode("don't stop; x2")) == 7  # don ' t stop ; x 2

    df = spark.createDataFrame([(7, "a1b2 -- ok")], "doc_id long, text string")
    row = token_counts(df).collect()[0]
    # a|1|b|2 (letter/digit runs) + -|- + ok = 7
    assert (row.n_tokens, row.tokenizer) == (7, "regex_bpe_proxy")


def test_token_budget_report_rolls_up_per_group(spark):
    from data_integration_system_spark.operators.tokenize import (
        token_budget_report,
        token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "s1", "two words"), (2, "s1", "three little words"), (3, "s2", "one")],
        "doc_id long, source string, text string",
    )
    counts = token_counts(docs, tokenizer_factory=_fake_word_tokenizer_factory())
    rep = {r.source: r for r in token_budget_report(counts, docs).collect()}
    assert (rep["s1"].n_docs, rep["s1"].n_tokens, rep["s1"].tokens_per_doc) == (2, 10, 5)
    assert (rep["s2"].n_docs, rep["s2"].n_tokens, rep["s2"].tokens_per_doc) == (1, 2, 2)


def test_bpe_tokenizer_applies_merges_by_rank():
    """The pure-Python BPE tier (r10): merges apply by RANK, not
    left-to-right greed — the property that distinguishes real BPE from
    a scanner.  With ranks [l+o, w+o, lo+w], 'lowlow' must merge the
    'lo's first (rank 0), then 'lo'+'w' (rank 2): ['low', 'low'] — a
    greedy left-to-right pass over pairs would produce the same tokens
    here only by luck, so also pin a case where rank order inverts the
    scan order: 'wo' (rank 1) beats 'lw'-adjacent merges absent from
    the table."""
    from data_integration_system_spark.operators.tokenize import bpe_tokenizer

    name, encode = bpe_tokenizer([("l", "o"), ("w", "o"), ("lo", "w")], name="toy")
    assert name == "toy"
    assert encode("lowlow") == ["low", "low"]
    # rank 1 fires before any unlisted pair; unmergeable tail stays chars
    assert encode("worm") == ["wo", "r", "m"]
    # pre-tokenizer splits words/digits/punct before merging
    assert encode("low-wo 12") == ["low", "-", "wo", "1", "2"]
    # no applicable merges: pure character sequence
    assert encode("xyz") == ["x", "y", "z"]
    # empty and whitespace-only inputs
    assert encode("") == [] and encode("   ") == []


def test_bpe_tokenizer_rides_the_spark_stage(spark):
    """The BPE factory composes with token_counts like any other tier:
    counts are post-merge token counts, label flows through."""
    from data_integration_system_spark.operators.tokenize import (
        bpe_tokenizer,
        token_counts,
    )

    df = spark.createDataFrame([(1, "lowlow xyz")], "doc_id long, text string")
    row = token_counts(
        df,
        tokenizer_factory=lambda: bpe_tokenizer(
            [("l", "o"), ("lo", "w")], name="toy"
        ),
    ).collect()[0]
    # 'lowlow' -> low, low (2) + 'xyz' -> x, y, z (3)
    assert (row.n_tokens, row.tokenizer) == (5, "toy")


def test_demo_merges_closed_form_matches_encoder():
    """token_count_bpe_exact's oracle rests on one identity: with
    DEMO_MERGES, every merge EVENT is a literal non-overlapping
    occurrence of its product string, so

        n_tokens = matched_chars - occ(th) - occ(the) - occ(in)
                                 - occ(an) - occ(and)

    Property-test it against the real encoder over an adversarial
    alphabet (the merge letters themselves plus separators), where
    every composition/overlap/priority interaction actually occurs —
    random English would barely exercise the 'and'/'an' and 'the'/'th'
    stacking."""
    import random

    from data_integration_system_spark.operators.tokenize import (
        _BPE_PROXY_RE,
        DEMO_MERGES,
        bpe_tokenizer,
    )

    _, encode = bpe_tokenizer(DEMO_MERGES, name="bpe:demo5")

    def closed_form(text: str) -> int:
        chars = sum(len(m) for m in _BPE_PROXY_RE.findall(text))
        occ = lambda p: len(text.split(p)) - 1  # noqa: E731 — non-overlapping count
        return (
            chars - occ("th") - occ("the") - occ("in") - occ("an") - occ("and")
        )

    rng = random.Random(11)
    alphabet = "thean di. 1"
    for _ in range(3000):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        assert len(encode(t)) == closed_form(t), repr(t)
    # directed composition cases (each killed a candidate closed form)
    for t, want in [
        ("the", 1), ("ththe", 2), ("thethe", 2), ("anand", 2),
        ("and", 1), ("aand", 2), ("anin", 2), ("ina", 2), ("tthe", 2),
        ("", 0), ("   ", 0), ("99!", 3),
    ]:
        assert len(encode(t)) == want == closed_form(t), t


def test_big_merges_structure():
    """The synthetic production-scale table: exactly 50k merges, no
    duplicate pairs, rank tiers ordered 2-grams < 3-grams < 4-grams
    (left-heavy chains), fully deterministic (pure function)."""
    from data_integration_system_spark.operators.tokenize import big_merges

    m = big_merges()
    assert len(m) == 50_000
    assert len(set(m)) == 50_000
    assert m == big_merges()
    assert m[0] == ("a", "a") and m[675] == ("z", "z")
    # tier boundaries: products grow 2 -> 3 -> 4 chars
    assert all(len(a + b) == 2 for a, b in m[:676])
    assert all(len(a + b) == 3 for a, b in m[676:676 + 17_576])
    assert all(len(a + b) == 4 for a, b in m[676 + 17_576:])


def test_bpe_fast_matches_naive_demo_and_big():
    """Implementation-agreement oracle for the no-closed-form regime:
    the heap + linked-list encoder must produce IDENTICAL token
    sequences to the naive rescan encoder — under DEMO_MERGES on an
    adversarial alphabet (rank ties, stacked compositions) AND under
    the full 50k table on random lowercase words (every word fires a
    merge chain).  Two independent algorithms agreeing on rank-order
    semantics is the correctness witness bench rides on."""
    import random

    from data_integration_system_spark.operators.tokenize import (
        DEMO_MERGES,
        big_merges,
        bpe_tokenizer,
        bpe_tokenizer_fast,
    )

    _, naive = bpe_tokenizer(DEMO_MERGES)
    _, fast = bpe_tokenizer_fast(DEMO_MERGES)
    rng = random.Random(23)
    alphabet = "thean di. 1"
    for _ in range(2000):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
        assert fast(t) == naive(t), repr(t)

    big = big_merges()
    _, naive_b = bpe_tokenizer(big)
    _, fast_b = bpe_tokenizer_fast(big)
    az = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(300):
        t = " ".join(
            "".join(rng.choice(az) for _ in range(rng.randint(1, 14)))
            for _ in range(rng.randint(1, 6))
        )
        assert fast_b(t) == naive_b(t), repr(t)
    # big-table merges really fire: every adjacent letter pair merges
    # (rank tier 1), so a word collapses to ceil(L/2) tokens — ~L/2
    # merge events per word, the cost regime DEMO_MERGES can't reach
    # (3-gram merges need a (2gram, char) adjacency, which pairwise
    # consumption mostly forecloses; real vocabs fire ~0.75L — same
    # order, honestly documented in big_merges' docstring)
    toks = fast_b("tokenization")
    assert len(toks) == 6 and "".join(toks) == "tokenization"


def test_token_count_bpe_big_rides_spark(spark):
    """The production-vocab tier end-to-end through the registered
    query at sf0.001: stable schema, one row per source, counts equal
    the driver-side fast encoder's counts (the Spark plumbing adds
    nothing and loses nothing)."""
    from data_integration_system_spark.operators.tokenize import (
        big_bpe_factory,
        token_count_bpe_big,
    )
    from data_integration_system_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    rows = token_count_bpe_big(spark, sf).collect()
    assert rows and all(r.tokenizer == "bpe:big50k" for r in rows)
    _, encode = big_bpe_factory()
    docs = table(spark, sf, "documents").select("source", "text").collect()
    want: dict = {}
    for r in docs:
        want[r.source] = want.get(r.source, 0) + len(encode(r.text or ""))
    got = {r.source: r.n_tokens for r in rows}
    assert got == want
