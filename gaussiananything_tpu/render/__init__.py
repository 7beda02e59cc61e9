from gaussiananything_tpu.render import cameras  # noqa: F401
