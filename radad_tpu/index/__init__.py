from radad_tpu.index.flat import FlatIndex  # noqa: F401
from radad_tpu.index.ivf import kmeans  # noqa: F401
from radad_tpu.index.quantized import QuantizedIndex  # noqa: F401
