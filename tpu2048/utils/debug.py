"""Debug-mode numerical checks (SURVEY.md §5 "race detection/sanitizers").

JAX's pure-function discipline removes the reference's in-place-mutation
bug class; what remains worth guarding is numerical health of the learner.
``checked(fn)`` wraps a jittable function with ``checkify`` float checks
(NaN/Inf) so a bad update fails loudly instead of silently poisoning
training. Enable via ``DQNTrainConfig``-level debugging or ad hoc in tests.
"""

from __future__ import annotations

from typing import Callable

from jax.experimental import checkify


def checked(fn: Callable) -> Callable:
    """Wrap ``fn`` with NaN/Inf checkify; raises on first bad float."""
    checked_fn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kw):
        err, out = checked_fn(*args, **kw)
        checkify.check_error(err)
        return out

    return wrapper
