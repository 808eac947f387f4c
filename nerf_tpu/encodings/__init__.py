from nerf_tpu.encodings.factory import create_encoding  # noqa: F401
from nerf_tpu.encodings.base import Encoding  # noqa: F401
from nerf_tpu.encodings.hashgrid import GridEncoding  # noqa: F401
from nerf_tpu.encodings.spherical import SphericalHarmonicsEncoding  # noqa: F401
from nerf_tpu.encodings.basic import (  # noqa: F401
    IdentityEncoding,
    FrequencyEncoding,
    OneBlobEncoding,
    TriangleWaveEncoding,
)
from nerf_tpu.encodings.composite import CompositeEncoding  # noqa: F401
