from data_integration_system_spark.functions.hashing import content_hash, url_hash
from data_integration_system_spark.functions.urls import domain_of, ext_of, is_blocked_ext

__all__ = ["content_hash", "url_hash", "domain_of", "ext_of", "is_blocked_ext"]
