"""Metric parity vs the reference Evaluation/metrics.py (float64, per-image)."""

import os
import sys

import numpy as np
import pytest

from tramba_tpu.eval.metrics import SODMetrics

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_metrics():
    ev = "/root/reference/Evaluation"
    if ev not in sys.path:
        sys.path.insert(0, ev)
    import metrics as M

    return M


def _cases():
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(4):
        gt = (rng.uniform(size=(37, 53)) > 0.7).astype(np.float32)
        pred = np.clip(gt * rng.uniform(0.4, 1.0, gt.shape) + rng.uniform(0, 0.4, gt.shape), 0, 1)
        cases.append((pred.astype(np.float32), gt))
    # blob-style case
    gt = np.zeros((40, 40), np.float32)
    gt[10:25, 12:30] = 1
    pred = np.clip(gt + rng.normal(0, 0.2, gt.shape), 0, 1).astype(np.float32)
    cases.append((pred, gt))
    # empty gt
    cases.append((rng.uniform(0, 0.3, (20, 20)).astype(np.float32), np.zeros((20, 20), np.float32)))
    return cases


def test_all_metrics_match_reference(ref_metrics):
    M = ref_metrics
    FM, WFM, SM, EM, MAE = (M.Fmeasure_and_FNR(), M.WeightedFmeasure(), M.Smeasure(), M.Emeasure(), M.MAE())
    ours = SODMetrics()
    for pred, gt in _cases():
        for m in (FM, WFM, SM, EM, MAE):
            m.step(pred=pred, gt=gt)
        ours.step(pred, gt)

    fm_all = FM.get_results()
    fm, fnr = fm_all[0]["fm"], fm_all[1]
    want = {
        "MAE": MAE.get_results()["mae"],
        "Smeasure": SM.get_results()["sm"],
        "wFmeasure": WFM.get_results()["wfm"],
        "adpFm": fm["adp"],
        "meanFm": fm["curve"].mean(),
        "maxFm": fm["curve"].max(),
        "adpEm": EM.get_results()["em"]["adp"],
        "meanEm": EM.get_results()["em"]["curve"].mean(),
        "maxEm": EM.get_results()["em"]["curve"].max(),
        "fnr": fnr,
    }
    got = ours.results()
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-6, atol=1e-9, err_msg=k)

    p_ref = fm_all[0]["pr"]["p"]
    r_ref = fm_all[0]["pr"]["r"]
    p, r = ours.precision_recall_curves()
    np.testing.assert_allclose(p, p_ref, rtol=1e-6)
    np.testing.assert_allclose(r, r_ref, rtol=1e-6)
