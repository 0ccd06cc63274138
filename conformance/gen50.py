"""Generate the BASELINE config-3 synthetic dataset: 50 ingroup
genomes + 3 outgroup genomes, ~1000 ortholog families.

BASELINE.json names a "50-genome bacterial order, ~1000 ortholog
families" config with no public dataset attached; this generator
simulates one: a random species tree over 50 ingroup taxa (+3
outgroups on a long basal branch), and per family a WAG-evolved
protein of 90-240 residues present in a random ~90% taxon subset
(min 6).  Per-family lognormal rate multipliers give realistic
branch-length spread.  Output: one .faa per genome under
conformance/scale50_data/{genomes,outgroup}/ plus truth.nwk.

Deterministic (seeded); ~2 min of host time.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from pepr_tpu.alphabet import decode
from pepr_tpu.tree import parse_newick, to_newick

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "scale50_data")

N_INGROUP = 50
N_OUTGROUP = 3
N_FAMILIES = 1000
SEED = 20260821


def random_topology(names, rng, scale=0.06):
    """Random binary merge tree (newick) with exp branch lengths."""
    nodes = [f"{n}:{rng.exponential(scale) + 0.01:.4f}" for n in names]
    while len(nodes) > 1:
        i, j = rng.choice(len(nodes), size=2, replace=False)
        a, b = nodes[i], nodes[j]
        rest = [n for k, n in enumerate(nodes) if k not in (i, j)]
        bl = rng.exponential(scale) + 0.01
        rest.append(f"({a},{b}):{bl:.4f}")
        nodes = rest
    return nodes[0]


def main():
    rng = np.random.default_rng(SEED)
    # distinct genus+species pairs: the default track's
    # unique-species filter keys on the first two name tokens, and
    # "Synthica sp." for every genome would collapse the dataset to
    # one genome (found the hard way)
    ingroup = [f"Synthica spec{i:02d} strain X" for i in range(N_INGROUP)]
    outgroup = [f"Outgroupia outg{i} strain Y" for i in range(N_OUTGROUP)]
    in_clade = random_topology(ingroup, rng)
    og_clade = random_topology(outgroup, rng, scale=0.10)
    # outgroups on a long basal branch
    nwk = f"({in_clade.rsplit(':', 1)[0]}:0.05," \
          f"{og_clade.rsplit(':', 1)[0]}:0.45);"
    tree = parse_newick(nwk)

    os.makedirs(os.path.join(OUT, "genomes"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "outgroup"), exist_ok=True)
    with open(os.path.join(OUT, "truth.nwk"), "w") as fh:
        fh.write(to_newick(tree) + "\n")

    from pepr_tpu.utils.simulate import simulate_alignment

    all_taxa = ingroup + outgroup
    per_genome: dict[str, list[str]] = {t: [] for t in all_taxa}
    for f in range(N_FAMILIES):
        length = int(rng.integers(90, 240))
        rate = float(np.exp(rng.normal(0.0, 0.35)))
        scaled = parse_newick(to_newick(tree))
        scaled.blen = scaled.blen * rate
        codes, taxa = simulate_alignment(scaled, length, rng)
        # random presence subset (ingroup ~90%; outgroups ~85%)
        keep = {t for t in taxa
                if rng.random() < (0.9 if t in ingroup else 0.85)}
        while len(keep) < 6:
            keep.add(taxa[int(rng.integers(len(taxa)))])
        for row, t in zip(codes, taxa):
            if t not in keep:
                continue
            seq = decode(row)
            title = f"fam{f:04d}_{t.replace(' ', '_')} [{t}]"
            per_genome[t].append(f">{title}\n{seq}")
        if (f + 1) % 200 == 0:
            print(f"{f + 1}/{N_FAMILIES} families", flush=True)

    for t in all_taxa:
        sub = "outgroup" if t in outgroup else "genomes"
        safe = t.replace(" ", "_").replace(".", "")
        path = os.path.join(OUT, sub, f"{safe}.faa")
        with open(path, "w") as fh:
            fh.write("\n".join(per_genome[t]) + "\n")
    n_in = sum(len(per_genome[t]) for t in ingroup)
    print(f"wrote {N_INGROUP}+{N_OUTGROUP} genomes, "
          f"{n_in} ingroup proteins, truth tree {OUT}/truth.nwk")


if __name__ == "__main__":
    main()
