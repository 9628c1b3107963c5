"""CLI entry points (train/test/create_data/import_torch_ckpt).

Regular package on purpose: the parity tests put the reference checkout on
sys.path, which also carries a namespace-package `tools/` directory; a
regular package (this __init__) always wins the import resolution, keeping
`import tools.train` pointed at THIS repo.
"""
