from radad_tpu.data.manifest import (  # noqa: F401
    Manifest, load_manifests, normalize_label, file_id, validate_no_leakage,
)
from radad_tpu.data.audio import load_audio, write_wav  # noqa: F401
