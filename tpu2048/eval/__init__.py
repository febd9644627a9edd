"""Evaluation & demo (SURVEY.md §2 row 14)."""

from tpu2048.eval.evaluate import (
    EvalResult,
    evaluate,
    greedy_dqn_policy,
    greedy_tabular_policy,
    random_legal_policy,
)

__all__ = [
    "EvalResult",
    "evaluate",
    "greedy_dqn_policy",
    "greedy_tabular_policy",
    "random_legal_policy",
]
