"""k-schedule gate semantics (reference models/mdgat.py:268-272)."""

from mdgat_tpu.core.config import train_defaults


def test_default_schedule_matches_reference_gate():
    cfg = train_defaults()  # L=9, k=[128,None,128,None,64,None,64,None]
    ks = cfg.layer_k_schedule(512)
    # layers 0..9 full attention; 10..17 follow the k list (None = full)
    assert ks[:10] == [None] * 10
    assert ks[10:] == [128, None, 128, None, 64, None, 64, None]


def test_k_clamped_to_full_when_k_geq_n():
    cfg = train_defaults()
    ks = cfg.layer_k_schedule(64)   # k=128 >= 64 keypoints -> full
    assert ks[10] is None and ks[12] is None
    assert ks[14] == 64 or ks[14] is None  # 64 >= 64 -> full
    assert ks[14] is None


def test_shorter_k_list_gates_later_layers():
    cfg = train_defaults(k=(32, 16))
    ks = cfg.layer_k_schedule(512)
    # i > 2L-1-len(k) = 15 -> layers 16,17 dynamic
    assert ks[:16] == [None] * 16
    assert ks[16:] == [32, 16]


def test_superglue_and_raw_disable_dynamic():
    assert train_defaults(net="superglue").layer_k_schedule(512) == [None] * 18
    assert train_defaults(net="raw").layer_k_schedule(512) == [None] * 18
