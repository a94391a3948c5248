"""End-to-end CLI learning proof (VERDICT r2 #2).

Exercises the SHIPPED entry points as subprocesses — ``train.py`` trains
on synthetic data and writes checkpoints, ``test.py`` /
``test_registration_metric.py`` evaluate the produced checkpoint — and
asserts the trained metrics clear fixed bars well above the random-init
baseline. This covers the checkpoint/BN-state handoff seam between the
CLIs that in-process tests cannot see (reference protocol:
``test.py:314-342``).

Subprocesses run on CPU (JAX_PLATFORMS=cpu) with the shared persistent
compile cache, so reruns cost seconds after the first compile. They
inherit the suite's 8-virtual-device XLA_FLAGS (conftest.py), so the
training fixture ALSO exercises the auto-selected shard_map path
(``--shard_map auto`` -> explicit per-shard execution on the 8-way data
axis) end-to-end at the CLI surface.
"""

import os
import re
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_COMMON = ["--synthetic", "true", "--max_keypoints", "64",
           "--batch_size", "8", "--platform", "cpu"]


def _run(script, extra, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, script)] + _COMMON + extra,
        env=env, cwd=_REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (
        f"{script} failed rc={r.returncode}\nstdout:\n{r.stdout[-3000:]}\n"
        f"stderr:\n{r.stderr[-3000:]}")
    return r.stdout


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    data = str(d / "kd")
    models = str(d / "models")
    out = _run("train.py", ["--train_path", data, "--epoch", "6",
                            "--model_out_path", models], cwd=_REPO)
    epochs = re.findall(r"epoch_loss (\d+\.\d+)", out)
    assert len(epochs) == 6, out[-2000:]
    first, last = float(epochs[0]), float(epochs[-1])
    assert last < first * 0.5, f"loss barely moved: {epochs}"
    cks = []
    for root, _, files in os.walk(models):
        cks += [os.path.join(root, f) for f in files if f.endswith(".npz")]
    assert cks, f"no checkpoint written under {models}"
    ck = max(cks, key=os.path.getmtime)
    return data, ck


def _aggregate(out, key):
    m = re.search(rf"{key} (-?\d+\.\d+|nan)", out)
    assert m, f"missing '{key}' in:\n{out[-2000:]}"
    return float(m.group(1))


def test_testpy_precision_beats_random_init(trained_checkpoint):
    data, ck = trained_checkpoint
    trained = _run("test.py", ["--train_path", data, "--resume_model", ck,
                               "--max_pairs", "24"], cwd=_REPO)
    random_init = _run("test.py", ["--train_path", data, "--resume_model",
                                   "/nonexistent.npz", "--max_pairs", "24"],
                       cwd=_REPO)
    p_trained = _aggregate(trained, "precision_mean")
    # random init: most pairs fail the pose gate; precision_mean may be
    # nan (no pair passed) — treat that as 0
    try:
        p_random = _aggregate(random_init, "precision_mean")
    except AssertionError:
        p_random = 0.0
    if p_random != p_random:  # nan
        p_random = 0.0
    assert p_trained > 0.5, f"trained precision too low: {p_trained}"
    assert p_trained > p_random + 0.25, (
        f"trained {p_trained} vs random-init {p_random}")


def test_ship_bf16_flip_tool(trained_checkpoint):
    """tools/measure_ship_bf16.py (README-cited --ship_bf16 divergence
    measurement) runs end-to-end: two pipeline passes over the identical
    pairs, flip accounting consistent, near-tie flip rate bounded (the
    on-chip study measured 0.17% at the 384-bucket config)."""
    import json
    data, ck = trained_checkpoint
    out = _run(os.path.join("tools", "measure_ship_bf16.py"),
               ["--train_path", data, "--resume_model", ck,
                "--max_pairs", "16"], cwd=_REPO)
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["pairs"] == 16
    assert rec["valid_slots"] > 0
    assert rec["flips"] == (rec["flips_match_to_unmatch"]
                            + rec["flips_unmatch_to_match"]
                            + rec["flips_retargeted"])
    assert rec["flip_rate_vs_valid"] < 0.01, rec


def test_registration_recall_clears_bar(trained_checkpoint):
    data, ck = trained_checkpoint
    out = _run("test_registration_metric.py",
               ["--train_path", data, "--resume_model", ck,
                "--max_pairs", "16"], cwd=_REPO)
    # final summary row: "rep inlier RR || precision recall F1 || ..."
    m = re.search(r"^([\d.]+) ([\d.]+) ([\d.]+) \|\|", out, re.M)
    assert m, f"missing summary row in:\n{out[-2000:]}"
    rr = float(m.group(3))
    assert rr > 0.6, f"registration recall too low: {rr}"


def test_shard_map_cli_eval_matches_plain(trained_checkpoint):
    """test.py on the 8-device mesh (auto shard_map eval) prints the SAME
    aggregate metrics line as the plain single-program path on the same
    checkpoint — the §5.8 capability proven at the shipped CLI surface."""
    data, ck = trained_checkpoint
    args = ["--train_path", data, "--resume_model", ck,
            "--max_pairs", "24"]
    sharded = _run("test.py", args, cwd=_REPO)
    plain = _run("test.py", args + ["--shard_map", "false"], cwd=_REPO)
    agg = lambda out: [ln for ln in out.splitlines()
                       if ln.startswith("average repeatibility")]
    assert agg(sharded) and agg(sharded) == agg(plain), (
        f"sharded:\n{agg(sharded)}\nplain:\n{agg(plain)}")


def test_pointnet_mode_cli_smoke(tmp_path_factory):
    """The learned-descriptor (PointNet++) mode through the SHIPPED CLIs:
    synthetic raw clouds are generated (cli.py:252), the staged train
    loop runs and checkpoints, and test.py evaluates the produced
    checkpoint in the same mode. A smoke test, not a learning proof —
    pointnet-mode convergence is too slow for CPU CI; gradient flow per
    stage is asserted in test_pointnet.py::test_staged_training.
    Reference path: models/mdgat.py:129-164 (pointnet branch) driven by
    train.py:98-113."""
    d = tmp_path_factory.mktemp("e2e_pn")
    data = str(d / "kd")
    models = str(d / "models")
    pn = ["--descriptor", "pointnet"]
    out = _run("train.py", pn + ["--train_path", data, "--epoch", "1",
                                 "--steps_per_epoch", "3", "--model_out_path",
                                 models], cwd=_REPO)
    losses = re.findall(r"epoch_loss (\d+\.\d+)", out)
    assert len(losses) == 1 and float(losses[0]) == float(losses[0]), out[-2000:]
    cks = []
    for root, _, files in os.walk(models):
        cks += [os.path.join(root, f) for f in files if f.endswith(".npz")]
    assert cks, f"no pointnet checkpoint written under {models}"
    ck = max(cks, key=os.path.getmtime)
    assert "pointnet" in ck  # run-name scheme reflects the mode

    ev = _run("test.py", pn + ["--train_path", data, "--resume_model", ck,
                               "--max_pairs", "8"], cwd=_REPO)
    # aggregate line prints; repeatability is data-driven (GT protocol),
    # nonzero even for an undertrained model
    rep = _aggregate(ev, "average repeatibility:")
    assert rep > 0.2, ev[-2000:]


def test_superglue_net_cli_smoke(tmp_path_factory):
    """The SuperGlue baseline net + its NLL loss through the SHIPPED
    CLIs (reference superglue.py:345-376 + train.py --net superglue —
    upstream this combination crashes, README "Reference divergences";
    here it must train, checkpoint under the superglue run-name scheme,
    and evaluate)."""
    d = tmp_path_factory.mktemp("e2e_sg")
    data = str(d / "kd")
    models = str(d / "models")
    sg = ["--net", "superglue", "--k", "None", "--loss_method", "superglue"]
    out = _run("train.py", sg + ["--train_path", data, "--epoch", "1",
                                 "--steps_per_epoch", "3",
                                 "--model_out_path", models], cwd=_REPO)
    losses = re.findall(r"epoch_loss (\d+\.\d+)", out)
    assert len(losses) == 1, out[-2000:]
    cks = []
    for root, _, files in os.walk(models):
        cks += [os.path.join(root, f) for f in files if f.endswith(".npz")]
    assert cks, f"no superglue checkpoint written under {models}"
    ck = max(cks, key=os.path.getmtime)
    assert "superglue" in ck  # run-name scheme reflects net + loss

    ev = _run("test.py", ["--net", "superglue", "--k", "None",
                          "--train_path", data, "--resume_model", ck,
                          "--max_pairs", "8"], cwd=_REPO)
    rep = _aggregate(ev, "average repeatibility:")
    assert rep > 0.2, ev[-2000:]
