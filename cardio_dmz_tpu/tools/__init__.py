"""Command-line tools (also exposed as console entry points, pyproject.toml).

The reference's operational tooling lives in fabfile.py + cython_dmz
(build + research harness, fabfile.py:16-70); here the equivalents are
standard-packaged CLIs: bench, serve_demo, train_models, extract_weights,
parity_ab (the compiled-reference A/B sweep), profile_expiry.
"""
