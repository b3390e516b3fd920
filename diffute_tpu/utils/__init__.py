from diffute_tpu.utils.params import init_pipeline_params  # noqa: F401
