from upliftingtabletennis_tpu.ops.attention import (
    NEG_INF,
    apply_rope_over_time,
    masked_attention,
)
