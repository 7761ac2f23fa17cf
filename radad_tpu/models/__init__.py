from radad_tpu.models.fusion import (  # noqa: F401
    ProjectionLayer, DetectionModel, RADADModel, build_radad_model,
)
from radad_tpu.models.encoder import FrozenEncoder, build_encoder  # noqa: F401
