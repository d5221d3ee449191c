from conzic_tpu.ops.attention import dot_product_attention, make_attention_bias

__all__ = ["dot_product_attention", "make_attention_bias"]
