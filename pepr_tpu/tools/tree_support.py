"""Support decoration CLI (TreeSupportDecorator.java:21 main role).

Usage: python -m pepr_tpu.tools.tree_support main.nwk supports.nwk
(supports file: one Newick per line).  Prints the decorated tree."""

from __future__ import annotations

import sys

from pepr_tpu.tree import decorate_supports, parse_newick, to_newick


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        return 2
    main_tree = parse_newick(open(argv[0]).read())
    sup = [parse_newick(l) for l in open(argv[1]) if l.strip()]
    print(to_newick(decorate_supports(main_tree, sup)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
