from mscnn_tpu.train import solver, train_step  # noqa: F401
