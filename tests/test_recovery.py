"""6%-subset fine-tune recovery workflow (reference README.md:12).

Gates the mechanism end-to-end at a reduced configuration: fp32 train ->
calibrate -> PTQ -> stratified-6%-subset DSGD fine-tune -> re-eval.  The
full-size committed run lives in docs/ACCURACY.md
(cli/recovery.py regenerates it).
"""

import pytest

from cnns_slfp_quantization_tpu.cli import recovery


@pytest.mark.slow
def test_subset_recovery_mechanism():
    # fp32_epochs=5: BN running stats need a stable tail — at <100 steps
    # the stats lag the fast-moving weights and eval-mode accuracy is
    # meaningless (measured: 4% running-stats vs 77% batch-stats eval
    # after 50 steps)
    row = recovery.run(
        net="mobilenet", qbit=7, fp32_epochs=5, train_images=3200,
        batch=128, subset_fraction=0.06, qat_epochs=4, qat_lr=1e-4,
        eval_images=512, seed=0)
    # the fp32 model actually learned (chance = 1%)
    assert row["acc_fp32"] > 10.0, row
    # exactly the stratified 6% subset was used (>= 1 image per class)
    assert row["subset_images"] == pytest.approx(
        0.06 * row["train_images"], rel=0.3)
    # fine-tuning must not make the quantized model worse than PTQ by more
    # than eval noise, and the mechanism must produce finite accuracies
    assert row["acc_recovered"] >= row["acc_ptq"] - 2.0, row
    assert 0.0 <= row["acc_recovered"] <= 100.0
