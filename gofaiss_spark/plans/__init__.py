from gofaiss_spark.plans.artifacts import (
    FORMAT_VERSION,
    check_version_compat,
    load_index,
    save_index,
)

__all__ = ["FORMAT_VERSION", "check_version_compat", "load_index", "save_index"]
