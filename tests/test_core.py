"""Unit tests for config, charsets, convertors, schedules, edit distance, accuracy."""

import os
import textwrap

import numpy as np
import pytest

from ccd_tpu.charsets import DICT36, DICT90, CharsetMapper, write_charset_file
from ccd_tpu.config import Config
from ccd_tpu.convertor import AttnConvertor, BaseConvertor
from ccd_tpu.evaluation import TextAccuracy, levenshtein
from ccd_tpu.schedules import cosine_iter_schedule, cosine_iter_schedule_array


# ---------------------------------------------------------------- config

def test_config_template_merge_and_flatten(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(textwrap.dedent("""
        global:
          name: myexp
          phase: train
          stage: pretrain-vision
          workdir: wd
        dataset:
          train: {roots: ['a', 'b']}
        arch: vit_tiny
    """))
    cfg = Config(str(cfg_file))
    assert cfg.arch == "vit_tiny"
    assert cfg.global_name == "myexp"
    assert cfg.global_workdir == os.path.join("wd", "myexp")
    assert cfg.dataset_train_roots == ["a", "b"]
    # template default survives
    assert cfg.patch_size == 4
    # missing attr -> None; prefix group -> dict
    assert cfg.nonexistent_thing is None
    assert isinstance(cfg.dataset, dict) and "num_workers" in cfg.dataset


def test_config_override(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("arch: vit_small\n")
    cfg = Config(str(cfg_file))
    cfg.override(batch_size_per_gpu=16, arch=None)
    assert cfg.batch_size_per_gpu == 16
    assert cfg.arch == "vit_small"  # None override is a no-op


# ---------------------------------------------------------------- charsets

def test_dicts():
    assert len(DICT36) == 36
    assert len(DICT90) == 90
    assert DICT90[0] == "0" and DICT90[35] == "z" and DICT90[36] == "A"


def test_charset_mapper_roundtrip(tmp_path):
    path = tmp_path / "charset_36.txt"
    write_charset_file(DICT36, str(path))
    m = CharsetMapper(str(path), max_length=26)
    assert m.num_classes == 37  # +1 null
    labels = m.get_labels("ab1", padding=False)
    assert labels == [m.char_to_label["a"], m.char_to_label["b"], m.char_to_label["1"]]
    assert m.get_text(labels, padding=False) == "ab1"
    padded = m.get_labels("hi")
    assert len(padded) == 26 and padded[2] == m.null_label
    assert m.trim(m.get_text(m.get_labels("hi"))) == "hi"


# ---------------------------------------------------------------- convertor

def test_attn_convertor_id_layout():
    c = AttnConvertor(dict_type="DICT90", max_seq_len=25, with_unknown=True)
    # chars 0..89, UKN=90, BOS/EOS=91 shared, PAD=92 -> 93 classes
    assert c.num_classes() == 93
    assert c.unknown_idx == 90
    assert c.start_idx == 91 and c.end_idx == 91
    assert c.padding_idx == 92


def test_attn_convertor_str2tensor():
    c = AttnConvertor(dict_type="DICT90", max_seq_len=10)
    t = c.str2tensor(["ab", "0"])
    assert t.shape == (2, 10)
    a_idx = c.char2idx["a"]
    b_idx = c.char2idx["b"]
    assert t[0, 0] == c.start_idx
    assert t[0, 1] == a_idx and t[0, 2] == b_idx
    assert t[0, 3] == c.end_idx
    assert (t[0, 4:] == c.padding_idx).all()
    # truncation when too long
    t2 = c.str2tensor(["abcdefghij123456"])
    assert t2.shape == (1, 10)
    assert t2[0, 0] == c.start_idx and (t2[0] != c.padding_idx).all()


def test_attn_convertor_tensor2idx_stops_at_eos():
    c = AttnConvertor(dict_type="DICT90", max_seq_len=6)
    C = c.num_classes() - 1  # classifier never predicts PAD
    logits = np.full((1, 6, C), -10.0, dtype=np.float32)
    seq = [c.char2idx["h"], c.char2idx["i"], c.end_idx, c.char2idx["x"], c.char2idx["x"], c.char2idx["x"]]
    for t, idx in enumerate(seq):
        logits[0, t, idx] = 10.0
    indexes, scores = c.tensor2idx(logits)
    assert c.idx2str(indexes) == ["hi"]
    assert all(s > 0.9 for s in scores[0])


def test_unknown_char_maps_to_ukn():
    c = AttnConvertor(dict_type="DICT36", max_seq_len=5, with_unknown=True)
    assert c.str2idx(["aZ"])[0][1] == c.unknown_idx
    c2 = BaseConvertor(dict_type="DICT36")
    with pytest.raises(ValueError):
        c2.str2idx(["Z"])


# ---------------------------------------------------------------- schedules

def test_cosine_schedule_array_shape_and_endpoints():
    s = cosine_iter_schedule_array(0.5, 0.001, 1000, warmup_iters=100)
    assert len(s) == 1000
    assert s[0] == 0.0
    assert abs(s[99] - 0.5) < 1e-6  # end of warmup hits base value
    assert s[100] <= 0.5 + 1e-6
    assert abs(s[-1] - 0.001) < 1e-3


def test_cosine_schedule_closed_form_matches_array():
    arr = cosine_iter_schedule_array(0.3, 0.01, 500, warmup_iters=50)
    for it in [0, 1, 49, 50, 51, 250, 499]:
        val = float(cosine_iter_schedule(it, 0.3, 0.01, 500, warmup_iters=50))
        assert abs(val - arr[it]) < 1e-5, (it, val, arr[it])


# ---------------------------------------------------------------- metrics

def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("flaw", "lawn") == 2


def test_text_accuracy_normalization():
    acc = TextAccuracy(case_sensitive=False)
    acc.update(["Hello!", "wOrld"], ["hello", "world"])
    res = acc.result()
    assert res["cwr"] == 1.0  # punctuation stripped + lowercased
    assert res["words"] == 2
    assert res["ted"] == 0


def test_text_accuracy_edit_distance():
    acc = TextAccuracy(case_sensitive=False)
    acc.update(["helo"], ["hello"])
    res = acc.result()
    assert res["cwr"] == 0.0
    assert res["ted"] == 1
    assert abs(res["ned"] - 1 / 5) < 1e-9


def test_all_shipped_configs_load():
    import glob
    import os
    from ccd_tpu.config import Config
    cfgs = glob.glob(os.path.join(os.path.dirname(__file__), "..", "ccd_tpu",
                                  "configs", "*.yaml"))
    assert len(cfgs) >= 7
    for path in cfgs:
        if path.endswith("template.yaml"):
            continue
        cfg = Config(path)
        assert cfg.arch in ("vit_tiny", "vit_small", "vit_base")
        assert cfg.patch_size == 4
        assert cfg.global_name


def test_builders_from_configs():
    import os
    from ccd_tpu.builders import build_pretrain_models, build_recognizer
    from ccd_tpu.config import Config
    base = os.path.join(os.path.dirname(__file__), "..", "ccd_tpu", "configs")
    pre = Config(os.path.join(base, "ccd_pretrain_vit_small.yaml"))
    student, teacher = build_pretrain_models(pre)
    assert student.arch == "vit_small" and student.out_dim == 65536
    assert student.with_seg_head and not teacher.with_seg_head
    assert not student.norm_last_layer and teacher.norm_last_layer

    ft = Config(os.path.join(base, "ccd_finetune_ard.yaml"))
    model, convertor = build_recognizer(ft)
    assert model.num_classes == 93 and model.start_idx == 91
    assert model.decoder_n_layers == 6 and model.max_seq_len == 25
