"""Config-driven data-quality audit engine.

The reference's differentiator (SURVEY.md §3.3): quality rules stored as
table rows — SQL predicate strings and mandatory-column lists — loaded
at runtime, evaluated against zone tables, logged to an append-only
result table with JSON payloads, exploded into fact tables, and
assembled into failure reports.

This implementation keeps rules-as-data exactly, with two scale fixes
over the reference (SURVEY.md §4 anti-patterns 3-4):
  - all rules for one table evaluate in a SINGLE scan (conditional
    aggregation) instead of one spark.sql round-trip per rule;
  - violated-PK samples are capped distributed (slice(sort_array(...)))
    instead of collecting every violation to the driver.
"""

from .config import CompletenessRule, ValidityRule  # noqa: F401
from .engine import (  # noqa: F401
    AUDIT_ERROR,
    AUDIT_FAIL,
    AUDIT_PASS,
    run_completeness_rules,
    run_validity_rules,
)
