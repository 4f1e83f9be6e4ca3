from openmvg_tpu.models import cameras
from openmvg_tpu.models.cameras import (
    Cameras,
    PINHOLE,
    PINHOLE_RADIAL_K1,
    PINHOLE_RADIAL_K3,
    PINHOLE_BROWN,
    PINHOLE_FISHEYE,
    SPHERICAL,
    make_pinhole,
)
