"""Convert a reference (shacklettbp/madrona-learn) orbax checkpoint into
this framework's param layout.

Usage:
    python scripts/import_reference_checkpoint.py <ref_ckpt_dir> <out_dir>

Restores the reference checkpoint pytree, repacks every
OptimizedLSTMCell subtree into the fused packed layout
(madrona_learn_tpu/compat/reference_import.py — all other module
families already match leaf-for-leaf), and saves the converted tree to
``out_dir`` with orbax. Load the result into a model with
``flax``'s usual apply, or splice the ``params`` subtree into a
``TrainStateManager`` checkpoint.

Equivalence is tested against the actually-running reference in
tests/test_reference_import.py (identical log-probs/entropies/values on
scored sequences).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    src, dst = sys.argv[1], sys.argv[2]

    import jax
    import orbax.checkpoint as ocp

    from madrona_learn_tpu.compat import import_reference_checkpoint

    converted = import_reference_checkpoint(src)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(dst), jax.device_get(converted))
    n = len(jax.tree.leaves(converted))
    print(f"converted {n} param leaves: {src} -> {dst}")


if __name__ == "__main__":
    main()
