"""acvae_tpu — a TPU-native audio-captioning VAE framework.

Re-implements the capabilities of the AC-VAE reference (XinMing0411/AC-VAE,
"Generating Accurate and Diverse Audio Captions through Variational Autoencoder
Framework") as an idiomatic JAX/XLA/Pallas framework:

* ``acvae_tpu.models``    — audio encoders, prior/posterior latent nets, text
  decoders and caption models (reference ``models/``).
* ``acvae_tpu.decoding``  — batched on-device greedy / sampling / beam /
  diverse-beam decoding (reference per-instance python loops in
  ``models/word_model.py`` / ``models/vae_model.py``).
* ``acvae_tpu.ops``       — masked pooling, losses, SpecAugment, sparse image
  warp, log-mel frontend (reference ``utils/train_util.py``, ``datasets/``).
* ``acvae_tpu.data``      — vocabulary, Clotho HDF5 pipeline, bucketing collate
  (reference ``datasets/caption_dataset.py``, ``utils/build_vocab.py``).
* ``acvae_tpu.train``     — jitted train step, optax schedules, orbax
  checkpoints (reference ``runners/``).
* ``acvae_tpu.evaluation``— caption metrics (BLEU/CIDEr/ROUGE/SPICE-lite) and
  the diversity suite (reference ``utils/score_util.py``, ``utils/diverse_*``).
* ``acvae_tpu.parallel``  — device mesh + NamedSharding data parallelism
  (reference DDP in ``runners/pytorch_runner_vae.py:155-161``).
"""

__version__ = "0.1.0"

PAD_IDX = 0
START_IDX = 1
END_IDX = 2
UNK_IDX = 3
# Reference token protocol: models/word_model.py:19-22, utils/build_vocab.py:100-103.
MAX_LENGTH = 20
