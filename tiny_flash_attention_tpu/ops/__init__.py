from tiny_flash_attention_tpu.ops.reference import (
    attention_naive,
    attention_safe,
    attention_online,
    flash_attention_v1_ref,
    flash_attention_v2_ref,
    mha_reference,
)
from tiny_flash_attention_tpu.ops.flash import flash_attention, FlashConfig
from tiny_flash_attention_tpu.ops.flash_v1 import flash_attention_v1
