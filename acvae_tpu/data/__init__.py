from acvae_tpu.data.vocab import Vocabulary, build_vocab, tokenize
from acvae_tpu.data.dataset import CaptionDataset, CaptionLoader, pick_bucket
from acvae_tpu.data.synthetic import make_synthetic_clotho
