from .masking import gen_seq_masks, make_attention_bias, NEG_INF
from .attention import multi_head_attention
