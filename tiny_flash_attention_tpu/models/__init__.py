from tiny_flash_attention_tpu.models.transformer import (
    ModelConfig,
    init_params,
    forward,
    quantize_params,
)
from tiny_flash_attention_tpu.models.kv_cache import PagedKVCache
