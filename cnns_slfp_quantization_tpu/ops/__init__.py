from cnns_slfp_quantization_tpu.ops import sfp  # noqa: F401
