from rwkv_tpu.utils.sampling import sample_logits, sample_probs  # noqa: F401
from rwkv_tpu.utils.tokenizer import get_tokenizer  # noqa: F401
