from acestep_tpu.training.step import make_train_step, tiny_batch  # noqa: F401
