from archnemesis_tpu.models.base import (
    ModelEntry,
    ProfileTarget,
    MODEL_REGISTRY,
    register_model,
)
import archnemesis_tpu.models.profile_models  # noqa: F401  (registers models)
import archnemesis_tpu.models.domain_models  # noqa: F401  (registers models)
import archnemesis_tpu.models.optics_models  # noqa: F401  (registers models)

__all__ = ["ModelEntry", "ProfileTarget", "MODEL_REGISTRY", "register_model"]
