from cnns_slfp_quantization_tpu.data import synthetic, transforms  # noqa: F401
