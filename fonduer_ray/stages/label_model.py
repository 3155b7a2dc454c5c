"""Generative label model: learned LF accuracies via EM (Dawid-Skene).

The reference fits snorkel's ``LabelModel`` over the LF matrix and predicts
marginals (``tests/e2e/test_e2e.py:317-320``). This module implements the
classic independent-LF generative model (Dawid & Skene 1979; the model
snorkel's matrix-completion approach estimates) with a **distributed EM
loop**: each iteration is one streaming pass over the sparse label rows —
``map_batches`` computes per-block partial sufficient statistics (per-LF
correct/total expectations and the class-balance sum), the driver reduces
the tiny per-LF table and broadcasts the updated parameters. Deterministic:
fixed init, fixed iteration count, no RNG.

Model: class balance ``p`` = P(y=1); per-LF accuracy ``alpha_j`` =
P(LF_j agrees with y | LF_j votes). Abstains carry no information.

E-step (per candidate): ``P(y=1|L) ∝ p * prod_j alpha_j^[L_j=+] *
(1-alpha_j)^[L_j=-]`` and symmetrically for y=0.
M-step: ``alpha_j = E[correct_j] / votes_j``, ``p = mean(q)``.

The learned log-odds weights plug straight into ``VoteScorer`` — the
weighted LF-vote scorer the north star mandates — so the generative fit
upgrades the majority vote without changing the serving path.
"""

from __future__ import annotations

import math

import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import get_broadcast


def _posterior(values: list[int], names: list[str], alpha: dict[str, float], p: float) -> float:
    """P(y=1 | sparse LF row) under the independent model. ``values`` use
    the engine's sparse encoding (0 abstain, 1 negative vote, 2 positive)."""
    log1 = math.log(p)
    log0 = math.log(1.0 - p)
    for name, v in zip(names, values):
        if v == 0:
            continue
        a = alpha[name]
        if v == 2:  # positive vote
            log1 += math.log(a)
            log0 += math.log(1.0 - a)
        else:  # v == 1: negative vote
            log1 += math.log(1.0 - a)
            log0 += math.log(a)
    m = max(log1, log0)
    e1, e0 = math.exp(log1 - m), math.exp(log0 - m)
    return e1 / (e1 + e0)


class LabelModel:
    """EM-fit generative model over a sparse label Dataset."""

    def __init__(self, n_iter: int = 25, init_acc: float = 0.7, clamp: float = 0.001):
        self.n_iter = n_iter
        self.init_acc = init_acc
        self.clamp = clamp
        self.alpha: dict[str, float] = {}
        self.p = 0.5

    def fit(self, label_ds: "ray.data.Dataset", lf_names: list[str]) -> "LabelModel":
        label_ds = label_ds.select_columns(["keys", "values"]).materialize()
        alpha = {n: self.init_acc for n in lf_names}
        p = 0.5
        for _ in range(self.n_iter):
            params_ref = ray.put((alpha, p))

            def partial_stats(batch: pa.Table) -> pa.Table:
                a, pp = get_broadcast(params_ref)
                correct = {n: 0.0 for n in a}
                votes = {n: 0 for n in a}
                q_sum, n_rows = 0.0, 0
                for names, values in zip(
                    batch["keys"].to_pylist(), batch["values"].to_pylist()
                ):
                    q = _posterior(values, names, a, pp)
                    q_sum += q
                    n_rows += 1
                    for name, v in zip(names, values):
                        if v == 0:
                            continue
                        votes[name] += 1
                        # expected agreement with the latent label
                        correct[name] += q if v == 2 else (1.0 - q)
                return pa.table(
                    {
                        "lf": pa.array(list(correct) + ["__q__"], pa.string()),
                        "correct": pa.array(
                            list(correct.values()) + [q_sum], pa.float64()
                        ),
                        "votes": pa.array(
                            [float(v) for v in votes.values()] + [float(n_rows)],
                            pa.float64(),
                        ),
                    }
                )

            # per-block partials -> tiny (n_lfs+1)-row reduction on the driver
            sums: dict[str, list[float]] = {}
            for b in (
                label_ds.map_batches(partial_stats, batch_format="pyarrow")
                .iter_batches(batch_size=65536, batch_format="pyarrow")
            ):
                for lf, c, v in zip(
                    b["lf"].to_pylist(), b["correct"].to_pylist(), b["votes"].to_pylist()
                ):
                    s = sums.setdefault(lf, [0.0, 0.0])
                    s[0] += c
                    s[1] += v
            qc, qn = sums.pop("__q__", [0.0, 0.0])
            lo, hi = self.clamp, 1.0 - self.clamp
            p = min(max(qc / qn if qn else 0.5, lo), hi)
            for n in lf_names:
                c, v = sums.get(n, [0.0, 0.0])
                alpha[n] = min(max(c / v if v else self.init_acc, lo), hi)
        self.alpha, self.p = alpha, p
        return self

    def weights(self) -> dict[str, float]:
        """Log-odds LF weights for ``VoteScorer``."""
        return {n: math.log(a / (1.0 - a)) for n, a in self.alpha.items()}

    def predict_proba(self, label_ds: "ray.data.Dataset") -> "ray.data.Dataset":
        """Exact model posteriors per candidate: ``(doc_name,
        candidate_stable_id, relation, split, prob)``."""
        params_ref = ray.put((self.alpha, self.p))

        def apply(batch: pa.Table) -> pa.Table:
            a, p = get_broadcast(params_ref)
            probs = [
                _posterior(values, names, a, p)
                for names, values in zip(
                    batch["keys"].to_pylist(), batch["values"].to_pylist()
                )
            ]
            return pa.table(
                {
                    "doc_name": batch["doc_name"],
                    "candidate_stable_id": batch["candidate_stable_id"],
                    "relation": batch["relation"],
                    "split": batch["split"],
                    "prob": pa.array(probs, pa.float64()),
                }
            )

        return label_ds.map_batches(apply, batch_format="pyarrow")
