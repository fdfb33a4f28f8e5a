"""Make the examples runnable from a source checkout without pip install.

Python puts the script's directory (examples/) on sys.path, so each
example does ``import _bootstrap`` and this single copy inserts the repo
root ahead of it. With the package pip-installed the extra path entry is
harmless (the checkout's package simply wins when both exist).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
