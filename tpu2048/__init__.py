"""tpu2048 — a TPU-native 2048 reinforcement-learning framework.

Brand-new JAX/XLA/pjit/Pallas re-design of the capabilities of the reference
project Rocco9999/2048_Q-Learning (mounted read-only at /root/reference):
a batched 2048 engine, Gym-style environments with the reference's shaped and
simple reward functions, a hashed-Q-table tabular agent, and a DQN agent with
replay memory, target network, checkpoint/resume, metrics, evaluation tooling
and a terminal demo — all built as pure-functional, jit/vmap'd, mesh-sharded
TPU programs.

See SURVEY.md at the repo root for the full layer map and component parity
inventory against the reference.
"""

__version__ = "0.1.0"
