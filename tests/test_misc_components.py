"""Tests for the launcher, legacy array loader, metrics, and profiling utils."""

import numpy as np

from structured_alignment_vqa_tpu.data.array_dataset import (
    ArrayBundle,
    create_arrays,
    get_batch_indices,
)
from structured_alignment_vqa_tpu.models.glove import SPECIALS
from structured_alignment_vqa_tpu.train.launch import PRESETS, build_train_argv, tpu_vm_command, main
from structured_alignment_vqa_tpu.utils.metrics import AverageMeter, precision_top_k


class TestLauncher:
    def test_presets_mirror_reference(self):
        # submit.py:76-104 production values
        assert PRESETS["obj_only"]["batch_size"] == 32
        assert PRESETS["obj_only"]["maxlen"] == 450
        assert PRESETS["obj_only"]["hidden_size_mil"] == 1024
        assert PRESETS["obj_rel"]["batch_size"] == 4
        assert PRESETS["obj_rel"]["maxlen"] == 1600
        assert PRESETS["obj_rel"]["hidden_size_mil"] == 64
        assert "only_obj" in PRESETS["obj_only"]["flags"]
        assert "only_obj" not in PRESETS["obj_rel"]["flags"]

    def test_build_argv(self):
        argv = build_train_argv("obj_only", "/data", "out", ["--num_epochs", "1"])
        assert "--only_obj" in argv
        assert argv[argv.index("--batch_size") + 1] == "32"
        assert argv[-2:] == ["--num_epochs", "1"]

    def test_tpu_command_and_dry_run(self, capsys):
        cmd = tpu_vm_command(["python", "x.py"], "mytpu", "us-central2-b", "proj")
        assert "gcloud" in cmd[0] and "--worker=all" in cmd
        out = main(["--preset", "obj_only", "--data_dir", "/d", "--tpu", "t",
                    "--dry_run"])
        assert "gcloud" in out and "--only_obj" in out


class TestArrayLoader:
    def test_create_arrays_layout(self):
        de2idx = {"man": 11, "red": 12, "</s>": 13, "what": 14}
        en2idx = {"yes": 2}
        feats = [np.ones((2, 8), np.float32), np.ones((1, 8), np.float32)]
        bundle = create_arrays(
            sents_syb=["man red what", "man oovword"],
            sents_vis=["man what", "red"],
            answers=["yes", "nope"],
            edges_syb=[[[0, 1], [1, 0]], []],
            edges_vis=[[[0, 1]], []],
            region_feats=feats,
            q_lengths=[1, 1],
            de2idx=de2idx, en2idx=en2idx, maxlen=10,
        )
        assert bundle.X_syb.shape == (2, 10)
        # tokens + </s>, PAD after
        np.testing.assert_array_equal(bundle.X_syb[0, :4], [11, 12, 14, 13])
        assert bundle.X_syb[0, 4] == SPECIALS.PAD
        assert bundle.X_syb[1, 1] == SPECIALS.UNK  # OOV fallback
        # visual tokens offset by region count
        assert bundle.X_vis[0, 0] == SPECIALS.PAD  # wait: pad value fills before
        np.testing.assert_array_equal(bundle.X_vis[0, 2:5], [11, 14, 13])
        # answers: id or 1 for OOV
        assert bundle.Y[0, 0] == 2 and bundle.Y[1, 0] == 1
        # stage-3 graph marks the question block
        q_start = 4 - 2  # len(x_syb)=4 (incl </s>), q_len+1=2
        assert bundle.G_syb[2][0, 3, 3] == 1

    def test_grid_self_connect(self):
        feats = [np.ones((3, 4), np.float32)]
        kw = dict(sents_syb=["man"], sents_vis=["man"], answers=["yes"],
                  edges_syb=[[]], edges_vis=[[]], region_feats=feats,
                  q_lengths=[0], de2idx={"man": 5, "</s>": 6}, en2idx={"yes": 2},
                  maxlen=8)
        a = create_arrays(**kw, grid_self_connect=False)
        b = create_arrays(**kw, grid_self_connect=True)
        assert a.G_vis[2][0, 0, 0] == 0
        assert b.G_vis[2][0, 0, 0] == 1

    def test_batch_indices_reference_quirk(self):
        # the reference advances before yielding: the first `batch_size`
        # shuffled indices are never emitted, and the final slice may be short
        batches = list(get_batch_indices(100, 16, seed=0))
        starts = [s for _, s in batches]
        assert starts == [16, 32, 48, 64, 80, 96]
        assert [len(i) for i, _ in batches] == [16, 16, 16, 16, 16, 4]


class TestMetrics:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(2.0, 2)
        m.update(4.0, 2)
        assert m.avg == 3.0 and m.count == 4

    def test_precision_top_k(self):
        logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
        target = np.array([1, 2])
        p1, p2 = precision_top_k(logits, target, top_k=(1, 2))
        assert p1 == 50.0
        assert p2 == 50.0


class TestStepTimer:
    def test_rate(self):
        from structured_alignment_vqa_tpu.utils.profiling import StepTimer

        t = StepTimer(window=10)
        assert t.tick() is None
        for _ in range(5):
            r = t.tick()
        assert r is not None and r > 0


class TestGloveGraft:
    def test_graft_glove_fills_tables(self):
        import jax
        import numpy as np
        from structured_alignment_vqa_tpu.data.synthetic import synthetic_batch
        from structured_alignment_vqa_tpu.models import AttModelX3
        from structured_alignment_vqa_tpu.models.config import tiny_test_config
        from structured_alignment_vqa_tpu.train.loop import graft_glove

        cfg = tiny_test_config()
        batch = synthetic_batch(cfg, batch=2, lv=3, lq=4, ls=8)
        model = AttModelX3(cfg)
        params = model.init(jax.random.key(0), batch)["params"]
        table = np.arange(20 * cfg.glove_dim, dtype=np.float32).reshape(20, cfg.glove_dim)
        new = graft_glove(params, table)
        # every GloVe table parameter got rows [0, 20) replaced
        n_found = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(new)[0]:
            if getattr(path[-1], "key", None) == "table":
                np.testing.assert_array_equal(np.asarray(leaf)[:20], table)
                n_found += 1
        assert n_found == 3  # vis, syb, mil copies (share_glove=False)
