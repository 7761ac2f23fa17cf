from radad_tpu.train.pipeline import (  # noqa: F401
    DetectionPipeline, make_embed_fn, retrieve_on_device,
    print_dataset_statistics,
)
from radad_tpu.train import metrics  # noqa: F401
