import os
import sys

# Make `cat_tpu` importable without installation.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
