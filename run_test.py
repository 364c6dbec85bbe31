#!/usr/bin/env python
"""Test CLI: python run_test.py --opt <yml>"""

import os.path as osp

from ood_gan_inversion_tpu.test import test_pipeline

if __name__ == "__main__":
    root_path = osp.abspath(osp.dirname(__file__))
    test_pipeline(root_path)
