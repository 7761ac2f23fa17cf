from radad_tpu.ops.segmenter import (  # noqa: F401
    segment_audio, segment_audio_np, num_segments,
)
from radad_tpu.ops.tpp import temporal_pyramid_pool, tpp_output_dim  # noqa: F401
