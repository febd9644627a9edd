"""Interactive terminal demo: manual / random / model play.

Behavioral re-design of the reference's Tkinter GUI
(/root/reference/GameDemo.py:145-347): same three modes — manual
(arrow-key play, GameDemo.py:258-269), random autoplay on a timer
(:272-285), and trained-model play with legal-move restriction
(:288-316) — rendered in the terminal with the official 2048 tile palette
(:323-330) as ANSI colors, score/moves/last-action HUD (:212-256), and a
game-over banner (:318-321).
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.env import EnvConfig, SIMPLE, env as envlib
from tpu2048.ops import board as board_ops

# Official 2048 tile colors (GameDemo.py:323-330) -> nearest ANSI-256.
TILE_COLORS = {
    0: 250, 2: 230, 4: 229, 8: 215, 16: 209,
    32: 203, 64: 196, 128: 221, 256: 220,
    512: 220, 1024: 178, 2048: 172,
}
ACTION_NAMES = ["Left", "Up", "Right", "Down"]  # mainDQL:189-196


def render_board(board_exp, score: int, moves: int, last_action: Optional[int]):
    values = np.asarray(board_ops.board_values(board_exp))
    lines = [
        f"  2048 — score {score}  moves {moves}  "
        f"last {ACTION_NAMES[last_action] if last_action is not None else '-'}"
    ]
    lines.append("  ┌──────┬──────┬──────┬──────┐")
    for i, row in enumerate(values):
        cells = []
        for v in row:
            color = TILE_COLORS.get(int(v), 172)
            text = f"{v:^6d}" if v else "      "
            cells.append(f"\x1b[48;5;{color}m\x1b[30m{text}\x1b[0m")
        lines.append("  │" + "│".join(cells) + "│")
        if i < 3:
            lines.append("  ├──────┼──────┼──────┼──────┤")
    lines.append("  └──────┴──────┴──────┴──────┘")
    return "\n".join(lines)


KEYMAP = {
    "a": 0, "w": 1, "d": 2, "s": 3,
    "h": 0, "k": 1, "l": 2, "j": 3,
    "\x1b[D": 0, "\x1b[A": 1, "\x1b[C": 2, "\x1b[B": 3,
}


def _read_key() -> str:
    """One keypress (arrow escape sequences included), cbreak mode."""
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setcbreak(fd)
        ch = sys.stdin.read(1)
        if ch == "\x1b":
            ch += sys.stdin.read(2)
        return ch
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


class GameSession:
    """One interactive game, UI-agnostic (shared by terminal + Tk GUIs).

    Wraps a single non-auto-resetting env with fused jitted step calls —
    eager per-op dispatch is prohibitive on a remote TPU (one RPC per op).
    Each call returns everything a HUD needs (board, score, legality) so
    the frontend does one transfer per move.
    """

    def __init__(self, mode: str = "manual", policy=None, seed: int = 0):
        if mode == "random":
            from tpu2048.eval.evaluate import random_legal_policy

            policy = random_legal_policy()
        if mode in ("random", "model") and policy is None:
            raise ValueError("model mode needs a policy")
        self.mode = mode
        self.config = EnvConfig(reward=SIMPLE, auto_reset=False)
        self.moves = 0
        self.last_action: Optional[int] = None

        config = self.config

        @jax.jit
        def _manual_step(st, action):
            st, ts = envlib.step(config, st, action)
            return st, ts.done[0], jnp.any(ts.legal_mask[0])

        if policy is not None:
            from tpu2048.eval.evaluate import as_policy

            policy = as_policy(policy)

        @jax.jit
        def _auto_step(params, st, k):
            # Weights are a jit ARGUMENT (not a closure constant): see
            # evaluate.Policy — closed-over CNN params blow the remote
            # compile-request size limit on tunneled TPU runtimes.
            legal = board_ops.legal_moves_mask(st.board)
            actions = policy.fn(params, st.board, legal, k)
            st, ts = envlib.step(config, st, actions)
            return st, actions[0], ts.done[0], jnp.any(ts.legal_mask[0])

        self._policy = policy
        self._manual_step = _manual_step
        self._auto_step = _auto_step
        self._key = jax.random.PRNGKey(seed)
        self.reset()

    def reset(self) -> None:
        self._key, k0 = jax.random.split(self._key)
        self.state = envlib.reset(self.config, k0, 1)
        self.moves = 0
        self.last_action = None
        self.alive = bool(
            jnp.any(jax.jit(board_ops.legal_moves_mask)(self.state.board)[0])
        )

    def step_manual(self, action: int) -> None:
        """Apply one directional move (0=L 1=U 2=R 3=D)."""
        self.state, done, any_legal = self._manual_step(
            self.state, jnp.asarray([action], jnp.int32)
        )
        self.last_action = action
        self.moves += 1
        self.alive = bool(any_legal) and not bool(done)

    def step_auto(self) -> int:
        """One policy-driven move (random/model modes); returns the action."""
        self._key, k_act = jax.random.split(self._key)
        self.state, act0, done, any_legal = self._auto_step(
            self._policy.params, self.state, k_act
        )
        self.last_action = int(act0)
        self.moves += 1
        self.alive = bool(any_legal) and not bool(done)
        return self.last_action

    def board_values(self) -> np.ndarray:
        return np.asarray(board_ops.board_values(self.state.board[0]))

    @property
    def score(self) -> int:
        return int(self.state.score[0])

    def stats(self) -> dict:
        return {
            "score": self.score,
            "moves": self.moves,
            "max_tile": int(board_ops.max_tile_value(self.state.board[0])),
        }


def play(
    mode: str = "manual",
    policy=None,
    delay: float = 0.5,
    seed: int = 0,
    max_steps: int = 10_000,
    out=sys.stdout,
    input_fn=None,
) -> dict:
    """Run one interactive game. ``policy(boards, legal, key) -> actions``
    drives ``random``/``model`` modes; ``manual`` reads the keyboard.

    Returns the final stats dict (score, moves, max tile).
    """
    session = GameSession(mode=mode, policy=policy, seed=seed)
    for _ in range(max_steps):
        print(render_board(session.state.board[0], session.score,
                           session.moves, session.last_action), file=out)
        if not session.alive:
            print("  GAME OVER", file=out)
            break
        if mode == "manual":
            raw = (input_fn() if input_fn else _read_key())
            if raw in ("q", "\x03", "\x04", ""):
                break
            action = KEYMAP.get(raw)
            if action is None:
                continue
            session.step_manual(action)
        else:
            session.step_auto()
            if delay:
                time.sleep(delay)
    return session.stats()
