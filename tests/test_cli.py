import itertools
import json

import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.cli.main import main, _parse_snrs
from short_ldpc_decoding_osd_tpu.osd import segments


def test_parse_snrs():
    got = _parse_snrs("2.0:3.0:6")
    np.testing.assert_allclose(got, np.linspace(2.0, 3.0, 6))


def test_conventional_path_enumeration():
    path = segments.conventional_path(3)
    # all unique patterns over 3 segments with sum <= 3
    assert len(path) == len({tuple(p) for p in path}) == 20
    assert all(sum(p) <= 3 for p in path)
    # builds TEP blocks under the 3-way convention split
    blocks, acc = segments.build_tep_blocks(path[:5], 64, convention=True)
    assert acc[0] == 0 and len(blocks) == 5


def test_cli_help_smoke(capsys):
    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for sub in ("train-nms", "eval-nms", "sweep", "baseline", "bench"):
        assert sub in out


def test_cli_train_and_eval_roundtrip(tmp_path):
    run_dir = str(tmp_path / "run")
    main([
        "train-nms", "--steps", "3", "--batch", "16", "--iterations", "3",
        "--run-dir", run_dir,
    ])
    main([
        "eval-nms", "--snrs", "4.0:4.0:1", "--batch", "128",
        "--error-budget", "1000000000", "--max-frames", "256",
        "--iterations", "3", "--run-dir", run_dir,
    ])
    blob = json.load(open(run_dir + "/nms_fer.json"))
    assert blob["points"][0]["frames"] == 256


def test_cli_eval_rayleigh_channel(tmp_path):
    """Rayleigh block fading (reference stage-4 option) through the CLI."""
    run_dir = str(tmp_path / "run")
    main([
        "eval-nms", "--snrs", "8.0:8.0:1", "--batch", "128",
        "--error-budget", "1000000000", "--max-frames", "256",
        "--iterations", "3", "--run-dir", run_dir,
        "--channel", "rayleigh", "--fade-duration", "16",
    ])
    blob = json.load(open(run_dir + "/nms_fer.json"))
    pt = blob["points"][0]
    assert pt["frames"] == 256
    # fading at 8 dB must err more than AWGN at 8 dB would (sanity only)
    assert 0.0 <= pt["fer"] <= 1.0


def test_every_dia_model_choice_reaches_registry():
    """Every advertised --dia-model spelling must construct a model (the r3
    CLI advertised rnn_one/rnn_two but make_dia only knew model_rnn1/2 —
    a bare KeyError after minutes of NMS training)."""
    from short_ldpc_decoding_osd_tpu.cli.main import DIA_MODEL_CHOICES
    from short_ldpc_decoding_osd_tpu.models import canonical_dia_name, make_dia

    for choice in DIA_MODEL_CHOICES:
        model = make_dia(choice, 128, 13)
        assert model.n == 128
        assert canonical_dia_name(choice) in (
            "model_cnn", "model_rnn1", "model_rnn2")
    with pytest.raises(ValueError, match="unknown DIA model"):
        make_dia("no_such_model", 128, 13)


def test_cli_sweep_args_reach_recipe_config(monkeypatch):
    """argparse -> RecipeConfig wiring for the stage-6 operating point and
    the DIA alias canonicalization (no pipeline work runs)."""
    import importlib

    cli_main = importlib.import_module("short_ldpc_decoding_osd_tpu.cli.main")
    from short_ldpc_decoding_osd_tpu.pipeline import recipe as recipe_mod

    seen = {}

    def fake_run_recipe(cfg, run_dir, snrs):
        seen["cfg"] = cfg
        return {"points": [{"snr_db": 0.0}]}

    monkeypatch.setattr(recipe_mod, "run_recipe", fake_run_recipe)
    cli_main.main([
        "sweep", "--dia-model", "rnn_one", "--threshold-sum", "2",
        "--decoding-length", "12", "--window", "4", "--soft-margin", "0.8",
        "--segments", "4", "--snrs", "2.0:2.0:1",
    ])
    cfg = seen["cfg"]
    assert cfg.dia_model == "model_rnn1"
    assert cfg.threshold_sum == 2
    assert cfg.decoding_length == 12
    assert cfg.window == 4
    assert cfg.soft_margin == 0.8
    assert cfg.num_segments == 4


def test_cli_sweep_rejects_bad_osd_point():
    import importlib

    cli_main = importlib.import_module("short_ldpc_decoding_osd_tpu.cli.main")
    with pytest.raises(SystemExit, match="soft-margin"):
        cli_main.main(["sweep", "--soft-margin", "1.5"])
    with pytest.raises(SystemExit, match="window"):
        cli_main.main(["sweep", "--window", "40"])


def test_cli_train_dia_and_stopper(tmp_path):
    """Standalone stage-3 subcommands produce the path + stopper artifacts."""
    run_dir = str(tmp_path / "run")
    main([
        "train-nms", "--steps", "2", "--batch", "16", "--iterations", "6",
        "--run-dir", run_dir,
    ])
    # iterations >= 6: the DIA CNN's three valid-padding convs need T+1 >= 7
    main([
        "train-stopper", "--iterations", "6", "--training-snr", "1.0",
        "--train-failures", "400", "--batch", "512", "--run-dir", run_dir,
    ])
    import os

    assert os.path.exists(run_dir + "/decoding_path.json")
    assert os.path.exists(run_dir + "/stopper_params.pkl")
    assert os.path.exists(run_dir + "/dia_model_cnn.pkl")
    # the RNN refiner end-to-end through the same CLI surface, via its alias
    # (r3: advertised but crashed with KeyError); reuses the cached failure
    # harvest in the run dir
    main([
        "train-dia", "--iterations", "6", "--training-snr", "1.0",
        "--train-failures", "400", "--batch", "512", "--run-dir", run_dir,
        "--dia-model", "rnn_one",
    ])
    assert os.path.exists(run_dir + "/dia_model_rnn1.pkl")
