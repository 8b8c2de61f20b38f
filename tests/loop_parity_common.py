"""Shared pieces of the live cross-stack loop-parity tests
(test_train_loop_parity.py / test_pretrain_loop_parity.py)."""
import numpy as np


class ScalarWriter:
    """tensorboardX-writer stand-in recording every add_scalar call."""

    def __init__(self):
        self.scalars = {}

    def add_scalar(self, name, value, global_step=None):
        self.scalars.setdefault(name, []).append(float(value))


def reference_adamw(model, lr, weight_decay=1e-2):
    """The reference entry points' AdamW parameter grouping
    (pretrain.py/train.py: LayerNorm + bias undecayed) — the same split
    our make_optimizer derives."""
    from vilbert.optimization import AdamW
    no_decay = ["bias", "LayerNorm.weight", "LayerNorm.bias"]
    groups = [{"params": [], "weight_decay": 0.0},
              {"params": [], "weight_decay": weight_decay}]
    for name, param in model.named_parameters():
        groups[0 if any(nd in name for nd in no_decay) else 1][
            "params"].append(param)
    return AdamW(groups, lr=lr)


def assert_final_params_close(our_sd, ref_sd, rel_tol=2e-2, abs_tol=1e-4):
    """Per-tensor rel-L2 with a near-zero absolute escape.

    Per-element compare is brittle for near-zero-gradient elements
    (bias-corrected Adam's first update is ~sign(g), so an O(1e-7)
    cross-stack grad difference can flip single elements by 2*lr);
    rel-L2 per tensor pins the structure (a transposed import, a wrong
    decay group, or a schedule bug shows as O(0.1-1) divergence).
    Near-zero tensors get the absolute escape: vil_logit.bias starts at
    0 and its batch-summed gradient nearly cancels, so after a few
    warmup steps BOTH stacks sit at ~1e-5 where rel-L2 is float noise
    (measured: ours 2.3e-6 vs ref 8.9e-6).  1e-4 is a tenth of one
    full-lr Adam step — a structural bug moves tensors by O(lr*steps)."""
    assert set(our_sd) == set(ref_sd)
    for k in sorted(ref_sd):
        a = np.asarray(our_sd[k], np.float32).ravel()
        b = np.asarray(ref_sd[k], np.float32).ravel()
        denom = max(float(np.linalg.norm(b)), 1e-6)
        rel = float(np.linalg.norm(a - b)) / denom
        absd = float(np.max(np.abs(a - b))) if a.size else 0.0
        assert rel < rel_tol or absd < abs_tol, (k, rel, absd)


def assert_params_moved(ref_sd, init_sd, min_move=1e-4):
    """The epoch actually trained: parameters moved from the shared init."""
    moved = max(float(np.max(np.abs(np.asarray(ref_sd[k], np.float32)
                                    - np.asarray(init_sd[k], np.float32))))
                for k in ref_sd)
    assert moved > min_move, moved
