"""Detection loss / metric tests: oracles, properties, finite differences."""

import numpy as np
import jax
import jax.numpy as jnp

from mscnn_tpu.ops import losses as L


def make_labels(rng, b, h, w, cls_num, n_pos=5, stride=8, field=32.0):
    """Random label maps [b,h,w,6]: sprinkle positives with boxes near cells."""
    lab = np.zeros((b, h, w, 6), np.float32)
    for bi in range(b):
        ids = rng.choice(h * w, n_pos, replace=False)
        for j in ids:
            hh, ww = j // w, j % w
            cx = (ww + 0.5) * stride + rng.uniform(-5, 5)
            cy = (hh + 0.5) * stride + rng.uniform(-5, 5)
            bw = field * np.exp(rng.uniform(-0.3, 0.3))
            bh = field * np.exp(rng.uniform(-0.3, 0.3))
            lab[bi, hh, ww] = [rng.randint(1, cls_num), cx, cy, bw, bh,
                               rng.uniform(0.6, 1.0)]
    return lab


def spec(cls_num=3, **kw):
    d = dict(cls_num=cls_num, field_w=32.0, field_h=32.0, stride=8,
             sample_mode="all")
    d.update(kw)
    return L.DetectionLossSpec(**d)


def test_cls_loss_matches_oracle_sample_all(rng):
    b, h, w, c = 2, 6, 8, 3
    head = rng.randn(b, h, w, c + 4).astype(np.float32)
    lab = make_labels(rng, b, h, w, c)
    sp = spec(bg_threshold=0.2)
    total, aux = L.detection_loss(jnp.asarray(head), jnp.asarray(lab), sp)
    # numpy oracle for the classification part
    s = h * w
    scores = head[..., :c].reshape(b, s, c)
    labf = lab.reshape(b, s, 6)
    cls_loss, cnt = 0.0, 0
    for bi in range(b):
        for j in range(s):
            lv = int(labf[bi, j, 0])
            if lv == 0 and labf[bi, j, 5] >= 0.2:
                continue  # not eligible bg and not pos -> skipped
            x = scores[bi, j]
            p = np.exp(x - x.max())
            p /= p.sum()
            cls_loss -= np.log(max(p[lv], 1e-30))
            cnt += 1
    cls_loss /= cnt
    assert abs(float(aux["cls_loss"]) - cls_loss) < 1e-4


def test_coord_loss_zero_for_perfect_preds(rng):
    b, h, w, c = 1, 6, 8, 3
    lab = make_labels(rng, b, h, w, c)
    sp = spec()
    # build head with coords equal to the encoded targets
    from mscnn_tpu.ops import boxes as B
    t = B.encode_anchor_field_targets(
        jnp.asarray(lab[..., 1]), jnp.asarray(lab[..., 2]),
        jnp.asarray(lab[..., 3]), jnp.asarray(lab[..., 4]),
        field_w=sp.field_w, field_h=sp.field_h, stride=sp.stride)
    head = np.concatenate(
        [rng.randn(b, h, w, c).astype(np.float32), np.asarray(t)], -1)
    total, aux = L.detection_loss(jnp.asarray(head), jnp.asarray(lab), sp)
    assert float(aux["coord_loss"]) < 1e-6


def test_bootstrap_keep_counts(rng):
    b, h, w, c = 2, 8, 8, 3
    head = rng.randn(b, h, w, c + 4).astype(np.float32)
    lab = make_labels(rng, b, h, w, c, n_pos=3)
    sp = spec(sample_mode="bootstrap", bg_multiple=2.0)
    total, aux = L.detection_loss(jnp.asarray(head), jnp.asarray(lab), sp)
    keep = int(aux["keep_num"])
    # per image, per class k: sort_num = max(4, n_k*2); union over classes
    # bounded above by sum, below by max
    for_img = []
    labf = lab.reshape(b, -1, 6)
    for bi in range(b):
        lv = labf[bi, :, 0].astype(int)
        eligible = ((lv == 0) & (labf[bi, :, 5] < 0.2)).sum()
        per_cls = [min(max(4, int((lv == k).sum() * 2)), eligible)
                   for k in range(1, c)]
        for_img.append((max(per_cls), sum(per_cls)))
    lo = sum(m for m, _ in for_img)
    hi = sum(s_ for _, s_ in for_img)
    assert lo <= keep <= hi


def test_random_mode_needs_key_and_samples_bg(rng):
    b, h, w, c = 1, 8, 8, 3
    head = rng.randn(b, h, w, c + 4).astype(np.float32)
    lab = make_labels(rng, b, h, w, c, n_pos=4)
    sp = spec(sample_mode="random", bg_multiple=2.0)
    total, aux = L.detection_loss(
        jnp.asarray(head), jnp.asarray(lab), sp, key=jax.random.PRNGKey(0))
    assert int(aux["keep_num"]) >= 1
    assert np.isfinite(float(total))


def test_detection_loss_grad_finite_difference(rng):
    """Analytic grad vs central differences (the GradientChecker analog)."""
    b, h, w, c = 1, 4, 4, 3
    head = (rng.randn(b, h, w, c + 4) * 0.5).astype(np.float32)
    lab = make_labels(rng, b, h, w, c, n_pos=3, stride=8, field=32.0)
    sp = spec(bb_smooth=True)

    def f(x):
        return L.detection_loss(x, jnp.asarray(lab), sp)[0]

    g = np.asarray(jax.grad(f)(jnp.asarray(head)))
    eps = 1e-3
    idxs = [(0, 1, 2, 0), (0, 2, 3, 2), (0, 1, 1, c), (0, 3, 2, c + 3)]
    for idx in idxs:
        hp = head.copy(); hp[idx] += eps
        hm = head.copy(); hm[idx] -= eps
        fd = (float(f(jnp.asarray(hp))) - float(f(jnp.asarray(hm)))) / (2 * eps)
        assert abs(fd - g[idx]) < 2e-3, (idx, fd, g[idx])


def test_smooth_l1_oracle(rng):
    n, d = 6, 8
    pred = rng.randn(n, d).astype(np.float32)
    targ = rng.randn(n, d).astype(np.float32)
    iw = (rng.rand(n, d) > 0.5).astype(np.float32)
    ow = rng.rand(n, d).astype(np.float32)
    for sigma in (1.0, 3.0):
        got = float(L.smooth_l1_loss(
            jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(iw),
            jnp.asarray(ow), sigma))
        s2 = sigma * sigma
        dd = iw * (pred - targ)
        per = np.where(np.abs(dd) < 1 / s2, 0.5 * dd * dd * s2,
                       np.abs(dd) - 0.5 / s2)
        want = (ow * per).sum() / n
        assert abs(got - want) < 1e-5


def test_softmax_ce_with_weights(rng):
    n, c = 10, 4
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n)
    w = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.3
    got = float(L.softmax_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(w), jnp.asarray(valid)))
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    want = -(w * valid * np.log(p[np.arange(n), labels])).sum() / max(valid.sum(), 1)
    assert abs(got - want) < 1e-5


def test_detection_accuracy_perfect(rng):
    b, h, w, c = 1, 6, 8, 3
    lab = make_labels(rng, b, h, w, c)
    sp = spec()
    from mscnn_tpu.ops import boxes as B
    t = B.encode_anchor_field_targets(
        jnp.asarray(lab[..., 1]), jnp.asarray(lab[..., 2]),
        jnp.asarray(lab[..., 3]), jnp.asarray(lab[..., 4]),
        field_w=sp.field_w, field_h=sp.field_h, stride=sp.stride)
    # scores strongly peaked at the true label
    onehot = np.eye(c, dtype=np.float32)[lab[..., 0].astype(int)] * 10
    head = np.concatenate([onehot, np.asarray(t)], -1)
    m = L.detection_accuracy(jnp.asarray(head), jnp.asarray(lab), sp)
    assert float(m["accuracy"]) == 1.0
    assert float(m["fore_accuracy"]) == 1.0
    assert float(m["boxiou"]) > 0.95


def test_detection_accuracy_empty_returns_minus1():
    b, h, w, c = 1, 4, 4, 3
    lab = np.zeros((b, h, w, 6), np.float32)
    lab[..., 5] = 1.0  # everything RONI-ignored
    head = np.zeros((b, h, w, c + 4), np.float32)
    m = L.detection_accuracy(jnp.asarray(head), jnp.asarray(lab), spec())
    assert float(m["accuracy"]) == -1.0
    assert float(m["fore_accuracy"]) == -1.0
    assert float(m["boxiou"]) == -1.0


def test_bbox_accuracy_improves_with_regression(rng):
    n, k = 8, 3
    gts = np.zeros((n, 4), np.float32)
    gts[:, 0] = rng.uniform(10, 50, n)
    gts[:, 1] = rng.uniform(10, 50, n)
    gts[:, 2] = gts[:, 0] + 40
    gts[:, 3] = gts[:, 1] + 40
    rois = gts + rng.uniform(-8, 8, (n, 4)).astype(np.float32)
    match_gt = np.zeros((n, 6), np.float32)
    match_gt[:, 0] = rng.randint(1, k, n)
    match_gt[:, 1:5] = gts
    # perfect regression deltas in the matched class slot
    from mscnn_tpu.ops import boxes as B
    pri_xywh = np.stack([rois[:, 0], rois[:, 1],
                         rois[:, 2] - rois[:, 0] + 1,
                         rois[:, 3] - rois[:, 1] + 1], -1)
    gt_xywh = np.stack([gts[:, 0], gts[:, 1],
                        gts[:, 2] - gts[:, 0] + 1,
                        gts[:, 3] - gts[:, 1] + 1], -1)
    t = np.asarray(B.encode_roi_targets(jnp.asarray(pri_xywh),
                                        jnp.asarray(gt_xywh)))
    pred = np.zeros((n, 4 * k), np.float32)
    for i in range(n):
        c = int(match_gt[i, 0])
        pred[i, 4 * c:4 * c + 4] = t[i]
    post, pre = L.bbox_accuracy(jnp.asarray(pred), jnp.asarray(rois),
                                jnp.asarray(match_gt))
    assert float(post) > float(pre)
    assert float(post) > 0.98
