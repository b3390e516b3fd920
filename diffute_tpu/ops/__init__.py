from diffute_tpu.ops.attention import dot_product_attention  # noqa: F401
