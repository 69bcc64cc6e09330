from .hashing import portable_hash64, portable_hash64_sql  # noqa: F401
from .parse import parse_audit_trail, parse_browser_events  # noqa: F401
