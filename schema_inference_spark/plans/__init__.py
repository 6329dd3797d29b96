from schema_inference_spark.plans.validation import (  # noqa: F401
    ValidationConfig,
    ValidationResult,
    run_validation,
)
