from acvae_tpu.decoding.sampling import sample_next_word
from acvae_tpu.decoding.beam import batched_beam_search, BeamConfig
from acvae_tpu.decoding.dbs import diverse_beam_search, DBSConfig
