from gaussiananything_tpu.utils import quaternions  # noqa: F401
