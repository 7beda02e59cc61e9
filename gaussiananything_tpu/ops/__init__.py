from gaussiananything_tpu.ops.gaussians import (  # noqa: F401
    GaussianSplats,
    activate_gaussians,
    pack_gaussians,
    unpack_gaussians,
)
