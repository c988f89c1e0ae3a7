from acvae_tpu.cli.main import Runner, main
