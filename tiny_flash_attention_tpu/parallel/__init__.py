from tiny_flash_attention_tpu.parallel.sharded import (
    make_mesh,
    sharded_flash_attention,
)
