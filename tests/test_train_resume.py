"""Training resume through the CLI: latest-state snapshot -> restore full
optimizer state and continue (exceeds the reference's save-only
checkpointing, SURVEY §5.4)."""
import glob
import os

import numpy as np


def test_uplifting_resume(tmp_path):
    from upliftingtabletennis_tpu.train.run_uplifting import main

    save = str(tmp_path / "ckpt")
    common = [
        "--model_name", "connectstage", "--model_size", "small",
        "--generate", "8", "--batch_size", "8",
        "--save_dir", save, "--logdir", str(tmp_path / "tb"),
        "--save_latest_every", "1", "--seed", "3",
    ]
    main(common + ["--num_epochs", "1"])
    run_dirs = glob.glob(os.path.join(save, "*"))
    assert run_dirs, "no run dir saved"
    latest = os.path.join(run_dirs[0], "latest")
    assert os.path.isdir(latest)

    # resume continues from the stored epoch with the stored identifier
    main(common + ["--num_epochs", "2", "--resume", latest])
    import json

    meta = json.load(open(os.path.join(latest, "meta.json")))
    assert meta["additional_info"]["epoch"] == 1  # advanced past epoch 0
