"""pepr_tpu — TPU-native phylogenomic estimation with progressive refinement.

A ground-up re-design of the capabilities of the PEPR pipeline
(reference: enordber/pepr, a Java orchestrator shelling out to native C
binaries) as a JAX/XLA/Pallas framework:

- Homology search (blat/blastall replacement): k-mer prefilter via hashed
  count-vector matmuls + batched wavefront Smith-Waterman on MXU/VPU.
- Ortholog clustering (mcl replacement): connected components + batched
  dense Markov-clustering iterations (expand = matmul, inflate, prune).
- MSA (muscle replacement): k-mer guide trees + batched profile-profile
  Needleman-Wunsch.
- Alignment trimming (Gblocks replacement): vectorized conservation masks.
- Profile HMM search (hmmbuild/hmmsearch replacement): batched Forward DP.
- Tree inference (FastTree_WAG/raxmlHPC replacement): Felsenstein pruning
  log-likelihood under WAG+Gamma as a site-batched kernel, NJ starting
  trees, NNI search, gradient branch-length optimization, jackknife
  support replicates fanned out across devices.
- Progressive refinement: re-run the pipeline on low-support subtrees and
  graft the results (reference: PhylogeneticTreeRefiner.java).
"""

__version__ = "0.1.0"
