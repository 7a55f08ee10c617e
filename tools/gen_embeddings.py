#!/usr/bin/env python3
"""Builder-side scale fixture: an embeddings.parquet at arbitrary row
count matching the driver testdata's measured shape (round-19
ratio-vs-SF evidence for the ANN/vector family — see BASELINE.md).

Distribution fitted from /root/testdata/sf0.1/embeddings.parquet
(2000 rows):
  - 64 float32 dims, unit L2 norm (per-dim std 0.125 = 1/sqrt(64));
  - 10 labels, uniform multinomial (182..218 per label at sf0.1);
  - cluster structure: per-label mean vector norm ~0.22 (vectors =
    normalize(1.85 * unit_centroid + N(0,1)^64) reproduces 0.19-0.25).

Deterministic (seed fixed per invocation). Usage:
  python3 tools/gen_embeddings.py <n_vecs> <out.parquet> [seed]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
N_LABELS = 10
CENTROID_SCALE = 1.85


def main() -> None:
    n_vecs = int(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((N_LABELS, DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n_vecs)
    vecs = CENTROID_SCALE * cents[labels] + rng.standard_normal((n_vecs, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {n_vecs} vecs -> {out}")


if __name__ == "__main__":
    main()
