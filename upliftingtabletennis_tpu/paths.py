"""Path configuration (ref: paths.py of the reference).

The reference uses three hand-edited module globals; here the same three
locations resolve from environment variables with sane defaults, and every
CLI also accepts explicit path arguments — the globals exist for scripts
that want the reference's import-and-use style.

  UTT_DATA_PATH     datasets root (tthq/, blurball/, ttst/, syntheticdata/)
  UTT_LOGS_PATH     tensorboard runs + saved models
  UTT_WEIGHTS_PATH  released/ported checkpoints
"""
import os

data_path = os.environ.get("UTT_DATA_PATH", os.path.join(os.getcwd(), "data"))
logs_path = os.environ.get("UTT_LOGS_PATH", os.path.join(os.getcwd(), "runs"))
weights_path = os.environ.get("UTT_WEIGHTS_PATH", os.path.join(os.getcwd(), "weights"))
