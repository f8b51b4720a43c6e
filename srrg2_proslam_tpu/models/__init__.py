"""Pipeline components: adaptors, aligner, merger, tracker, local maps,
loop closure, pose graph, and the GraphSLAM orchestrator."""
