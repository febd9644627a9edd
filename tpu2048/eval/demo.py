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
    config = EnvConfig(reward=SIMPLE, auto_reset=False)
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    state = envlib.reset(config, k0, 1)

    if mode == "random":
        from tpu2048.eval.evaluate import random_legal_policy

        policy = random_legal_policy()
    if mode in ("random", "model") and policy is None:
        raise ValueError("model mode needs a policy")

    # Fused jitted calls — eager per-op dispatch is prohibitive on a
    # remote TPU (one RPC per op). Each call returns everything the HUD
    # needs (board, score, legality) so the loop does one transfer/step.
    @jax.jit
    def manual_step(st, action):
        st, ts = envlib.step(config, st, action)
        return st, ts, jnp.any(ts.legal_mask[0])

    @jax.jit
    def auto_step(st, k):
        legal = board_ops.legal_moves_mask(st.board)
        actions = policy(st.board, legal, k)
        st, ts = envlib.step(config, st, actions)
        return st, ts, actions[0], jnp.any(ts.legal_mask[0])

    moves = 0
    last_action = None
    alive = bool(jnp.any(jax.jit(board_ops.legal_moves_mask)(state.board)[0]))
    for _ in range(max_steps):
        print(render_board(state.board[0], int(state.score[0]), moves,
                           last_action), file=out)
        if not alive:
            print("  GAME OVER", file=out)
            break
        if mode == "manual":
            raw = (input_fn() if input_fn else _read_key())
            if raw in ("q", "\x03", "\x04", ""):
                break
            action = KEYMAP.get(raw)
            if action is None:
                continue
            state, ts, any_legal = manual_step(
                state, jnp.asarray([action], jnp.int32)
            )
            last_action = action
        else:
            key, k_act = jax.random.split(key)
            state, ts, act0, any_legal = auto_step(state, k_act)
            last_action = int(act0)
            if delay:
                time.sleep(delay)
        moves += 1
        alive = bool(any_legal) and not bool(ts.done[0])
    return {
        "score": int(state.score[0]),
        "moves": moves,
        "max_tile": int(board_ops.max_tile_value(state.board[0])),
    }
