"""Quality gates — pure functions over validation results (SURVEY §5).

Port of src/quality/gates.py:30-58 with the thresholds of
src/config/quality_config.py:5-12. Gates are driver-side decisions on
already-aggregated dicts; no Spark involvement.
"""

from __future__ import annotations

from dataclasses import dataclass


class ValidationHardFailError(Exception):
    """Raised to abort the pipeline on a hard quality failure."""


@dataclass
class QualityGateConfig:
    min_job_count: int = 50
    hard_fail_duplicate_rate: float = 0.20
    success_threshold: float = 0.90
    warning_threshold: float = 0.70
    max_data_loss_rate: float = 0.05


STAGING_GATE = QualityGateConfig(success_threshold=0.95, warning_threshold=0.90)


@dataclass
class GateResult:
    status: str  # 'success' | 'warning'
    valid_rate: float
    message: str


def evaluate_gate(result: dict, config: QualityGateConfig | None = None) -> GateResult:
    """Evaluate a validator dict; raises ValidationHardFailError on hard fail."""
    cfg = config or QualityGateConfig()
    total = result.get("total_jobs", 0)
    if total == 0:
        raise ValidationHardFailError("No jobs found")
    if total < cfg.min_job_count:
        raise ValidationHardFailError(
            f"Job count {total} below minimum {cfg.min_job_count}"
        )
    if result.get("duplicate_rate", 0.0) > cfg.hard_fail_duplicate_rate:
        raise ValidationHardFailError(
            f"Duplicate rate {result['duplicate_rate']:.1%} too high"
        )
    loss = result.get("data_loss_rate")
    if loss is not None and loss > cfg.max_data_loss_rate:
        raise ValidationHardFailError(f"Data loss {loss:.1%} exceeds 5%")
    rate = result.get("valid_rate", 0.0)
    if rate < cfg.warning_threshold:
        raise ValidationHardFailError(f"Valid rate {rate:.1%} below threshold")
    if rate < cfg.success_threshold:
        return GateResult("warning", rate, f"Warning: {rate:.1%} valid")
    return GateResult("success", rate, f"Passed: {rate:.1%} valid")
