"""Sphinx configuration (parity with the reference's docs pipeline,
/root/reference/docs/conf.py + .github/workflows/testing.yml:54-85): MyST
markdown sources, built by the docs CI job and deployed to Pages on main."""

project = "torch_m3gnet_tpu"
author = "torch_m3gnet_tpu developers"

extensions = ["myst_parser"]
myst_enable_extensions = ["dollarmath", "amsmath"]

source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
master_doc = "index"
exclude_patterns = ["_build"]

html_theme = "alabaster"
html_title = "torch_m3gnet_tpu"
