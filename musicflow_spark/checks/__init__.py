from musicflow_spark.checks.runner import CheckResult, CheckSet  # noqa: F401
from musicflow_spark.checks.suite import reference_suite  # noqa: F401
