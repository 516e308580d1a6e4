from style_seqcvae_tpu.data.tokenizer import tokenize_caption, word_tokenize
from style_seqcvae_tpu.data.vocabulary import Vocabulary
