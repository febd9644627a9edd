#!/bin/bash
# r5 table-kernel chip session: correctness on the REAL chip first, then
# the batch-1024/4096 A/B against the legacy table (VERDICT r4 #3 "Done"
# criterion). One TPU process at a time; run only when the chip is free.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
out=docs/bench_r5_table.jsonl
: > "$out"

echo "[table-bench] compiled-kernel correctness vs jnp twins + legacy"
timeout 600 python - <<'EOF' || exit 1
import jax, jax.numpy as jnp, numpy as np
from tpu2048.agents import tabular as tab
from tpu2048.agents import tabular_fast as tabf
from tpu2048.ops import table_kernel as tk

assert jax.default_backend() != "cpu", "needs the real chip"
rng = np.random.default_rng(0)

# Raw kernels vs twins at a production-like capacity (2**22 slots).
nb = (1 << 22) // 16
data = jnp.zeros((nb + 1, tk.ROW), jnp.uint32).at[:256].set(
    jnp.asarray(rng.integers(0, 2**32, (256, tk.ROW), dtype=np.uint32))
)
buckets = jnp.asarray(rng.integers(0, nb, (1024,), dtype=np.int32))
g_k = tk.bucket_gather(data, buckets)
g_x = tk.bucket_gather_xla(data, buckets)
assert bool((g_k == g_x).all()), "compiled gather != twin"
ids = jnp.asarray(
    np.concatenate([rng.choice(nb, 768, replace=False),
                    np.full((256,), nb)]).astype(np.int32))
rows = jnp.asarray(
    rng.integers(0, 2**32, (1024, 16, 8), dtype=np.uint32))
d_k = tk.bucket_scatter(jnp.array(data), ids, rows)
d_x = tk.bucket_scatter_xla(jnp.array(data), ids, rows)
assert bool((d_k[:-1] == d_x[:-1]).all()), "compiled scatter != twin"
print("raw kernels: compiled == twins OK")

# Full fast step on chip (pallas) vs twin (xla), collision-inclusive.
key = jax.random.PRNGKey(0)
table = tab.qtable_init(16)
boards = jax.random.randint(key, (200, 4, 4), 0, 12, dtype=jnp.int8)
acts = jax.random.randint(jax.random.fold_in(key, 1), (200,), 0, 4)
tgts = jax.random.normal(jax.random.fold_in(key, 2), (200,))
table = tab.qtable_update(table, boards, acts, tgts, 0.5)
packed = tabf.pack_qtable(table)
b2 = jax.random.randint(jax.random.fold_in(key, 3), (256, 4, 4), 0, 12, dtype=jnp.int8)
n2 = jax.random.randint(jax.random.fold_in(key, 4), (256, 4, 4), 0, 12, dtype=jnp.int8)
rw = jax.random.normal(jax.random.fold_in(key, 5), (256,))
dn = jnp.arange(256) % 4 == 0
outs = {}
for bk in ("pallas", "xla"):
    p = jax.tree.map(jnp.copy, packed)
    a, probe = tabf.fast_choose_actions_probed(p, b2, 0.3, key, backend=bk)
    t = tabf.fast_targets(p, rw, n2, dn, 0.9, backend=bk)
    p = tabf.fast_update(p, probe, a, t, 0.1, backend=bk)
    outs[bk] = (np.asarray(a), np.asarray(t), np.asarray(p.data[:-1]), int(p.dropped))
for x, y in zip(outs["pallas"], outs["xla"]):
    np.testing.assert_array_equal(x, y)
print("full fast step: pallas == xla twin on chip OK (collisions incl.)")
EOF
rc=$?
echo "[table-bench] correctness rc=$rc"
[ $rc -ne 0 ] && exit $rc

for batch in 1024 4096; do
  for bk in pallas legacy; do
    echo "[table-bench] batch=$batch backend=$bk"
    timeout 900 python bench.py --tabular --batch "$batch" \
      --table-backend "$bk" | tail -1 | tee -a "$out"
  done
done
echo "[table-bench] done -> $out"
