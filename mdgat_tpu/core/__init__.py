from mdgat_tpu.core.config import Config, train_defaults, test_defaults
