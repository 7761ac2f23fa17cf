from radad_tpu.models.fusion import (  # noqa: F401
    ProjectionLayer, DetectionModel, RADADModel, build_radad_model,
)
