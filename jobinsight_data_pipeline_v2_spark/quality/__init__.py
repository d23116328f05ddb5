"""Quality validation: single-pass aggregations + pure-function gates."""

from .gates import GateResult, QualityGateConfig, ValidationHardFailError, evaluate_gate
from .validators import (
    business_rule_violations,
    crawl_validation,
    staging_validation,
)

__all__ = [
    "GateResult",
    "QualityGateConfig",
    "ValidationHardFailError",
    "evaluate_gate",
    "business_rule_violations",
    "crawl_validation",
    "staging_validation",
]
