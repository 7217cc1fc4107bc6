from categoricalnf_tpu.ops import numerics  # noqa: F401
