"""Segmentation/margin losses vs torch oracle; metrics vs sklearn."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gloria_tpu.ops import contrastive_loss as cl
from gloria_tpu.ops import segmentation_loss as sl
from gloria_tpu.training import metrics as M

torch = pytest.importorskip("torch")


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def test_focal_and_mixed_match_torch_formulation():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 16, 16).astype(np.float32) * 3
    target = (rng.rand(4, 16, 16) > 0.7).astype(np.float32)
    tl, tt = torch.from_numpy(logits), torch.from_numpy(target)

    # reference FocalLoss formula (segmentation_loss.py:54-75)
    max_val = (-tl).clamp(min=0)
    loss = tl - tl * tt + max_val + ((-max_val).exp() + (-tl - max_val).exp()).log()
    invprobs = torch.nn.functional.logsigmoid(-tl * (tt * 2.0 - 1.0))
    ref_focal = ((invprobs * 2.0).exp() * loss).mean().item()
    np.testing.assert_allclose(float(sl.focal_loss(jnp.asarray(logits), jnp.asarray(target))), ref_focal, rtol=1e-5)

    # reference dice coefficient (with sigmoid) and mixed loss
    pred = torch.sigmoid(tl).view(-1)
    t = tt.view(-1)
    ref_dice = ((2 * (pred * t).sum() + 1) / (pred.sum() + t.sum() + 1)).item()
    np.testing.assert_allclose(float(sl.dice_coefficient(jnp.asarray(logits), jnp.asarray(target))), ref_dice, rtol=1e-5)
    ref_mixed = 10 * ref_focal - np.log(ref_dice)
    np.testing.assert_allclose(float(sl.mixed_loss(jnp.asarray(logits), jnp.asarray(target))), ref_mixed, rtol=1e-5)


def test_dice_loss_per_sample():
    rng = np.random.RandomState(1)
    pred = rng.rand(3, 32).astype(np.float32)
    t = (rng.rand(3, 32) > 0.5).astype(np.float32)
    num = (pred * t).sum(-1) + 1
    den = (pred**2 + t**2).sum(-1) + 1
    ref = (1 - num / den).mean()
    np.testing.assert_allclose(float(sl.dice_loss(jnp.asarray(pred), jnp.asarray(t))), ref, rtol=1e-5)


def test_bce_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(8, 5).astype(np.float32)
    y = (rng.rand(8, 5) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(y)).item()
    np.testing.assert_allclose(float(sl.bce_with_logits(jnp.asarray(logits), jnp.asarray(y))), ref, rtol=1e-5)
    w = np.asarray([1.0, 2.0, 0.5, 1.5, 3.0], np.float32)
    ref_w = torch.nn.BCEWithLogitsLoss(pos_weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(y)).item()
    np.testing.assert_allclose(
        float(sl.bce_with_logits(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(w))), ref_w, rtol=1e-5)


def test_margin_losses_match_torch_oracle():
    rng = np.random.RandomState(3)
    im = rng.randn(6, 8).astype(np.float32)
    s = rng.randn(6, 8).astype(np.float32)
    ti, ts = torch.from_numpy(im), torch.from_numpy(s)

    scores = ti.mm(ts.t())
    diagonal = scores.diag().view(6, 1)
    cost_s = (0.2 + scores - diagonal.expand_as(scores)).clamp(min=0)
    cost_im = (0.2 + scores - diagonal.t().expand_as(scores)).clamp(min=0)
    eye = torch.eye(6) > 0.5
    cost_s = cost_s.masked_fill_(eye, 0)
    cost_im = cost_im.masked_fill_(eye, 0)
    ref = (cost_s.sum() + cost_im.sum()).item()
    got = float(cl.contrastive_loss(jnp.asarray(im), jnp.asarray(s), margin=0.2))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    ref_max = (cost_s.max(1)[0].sum() + cost_im.max(0)[0].sum()).item()
    got_max = float(cl.contrastive_loss(jnp.asarray(im), jnp.asarray(s), margin=0.2, max_violation=True))
    np.testing.assert_allclose(got_max, ref_max, rtol=1e-5)

    # hard negative variant
    sc = ti.mm(ts.t())
    diag = sc.diag()
    sc2 = sc - 2 * torch.diag(diag)
    max_c = torch.sort(sc2, 0, descending=True)[0][:1, :]
    max_i = torch.sort(sc2, 1, descending=True)[0][:, :1]
    ref_hn = (torch.clamp(max_c + (0.2 - diag).view(1, -1), min=0).sum()
              + torch.clamp(max_i + (0.2 - diag).view(-1, 1), min=0).sum()).item()
    got_hn = float(cl.hard_negative_contrastive_loss(jnp.asarray(im), jnp.asarray(s)))
    np.testing.assert_allclose(got_hn, ref_hn, rtol=1e-5)


def test_auroc_ap_match_sklearn():
    from sklearn.metrics import average_precision_score, roc_auc_score

    rng = np.random.RandomState(4)
    scores = rng.rand(5, 200).astype(np.float32)
    scores[:, :50] = np.round(scores[:, :50], 1)  # force ties
    labels = (rng.rand(5, 200) > 0.8).astype(np.float32)
    auroc = np.asarray(M.binary_auroc(jnp.asarray(scores), jnp.asarray(labels)))
    ap = np.asarray(M.binary_average_precision(jnp.asarray(scores), jnp.asarray(labels)))
    for i in range(5):
        np.testing.assert_allclose(auroc[i], roc_auc_score(labels[i], scores[i]), rtol=1e-5)
        np.testing.assert_allclose(ap[i], average_precision_score(labels[i], scores[i]), rtol=1e-4)
    # degenerate rows → NaN
    one_class = np.zeros((1, 200), np.float32)
    assert np.isnan(np.asarray(M.binary_auroc(jnp.asarray(scores[:1]), jnp.asarray(one_class)))).all()


def test_topk_overlap_metrics():
    scores = jnp.asarray(np.linspace(1, 0, 100, dtype=np.float32)[None])
    labels = np.zeros((1, 100), np.float32)
    labels[0, :10] = 1  # top-10 scores are exactly the positives
    out = M.topk_overlap_metrics(scores, jnp.asarray(labels), 0.10)
    assert float(out["precision"][0]) == 1.0
    assert float(out["recall"][0]) == 1.0
    assert float(out["iou"][0]) == 1.0
    out2 = M.topk_overlap_metrics(scores, jnp.asarray(labels), 0.20)
    np.testing.assert_allclose(float(out2["precision"][0]), 0.5)
    np.testing.assert_allclose(float(out2["recall"][0]), 1.0)


def test_dice_score_reference_convention():
    prob = np.zeros((3, 16))
    truth = np.zeros((3, 16))
    prob[0, :4] = 0.9; truth[0, :4] = 1        # perfect positive → 1
    truth[1, :2] = 1                            # missed positive → 0
    # row 2: empty truth, empty pred → 1
    assert M.dice_score(prob, truth) == pytest.approx((1.0 + 0.0 + 1.0) / 3)
