#!/usr/bin/env python
"""Pack an image folder into an OGIPack file (the reference's
make_lmdb_from_imgs analogue, BasicSR/basicsr/utils/lmdb_util.py).

python tools/make_packed_dataset.py <image_folder> <out.ogipack>
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from ood_gan_inversion_tpu.runtime.packio import write_pack  # noqa: E402

EXTS = (".png", ".jpg", ".jpeg")


def main():
    folder, out = sys.argv[1], sys.argv[2]
    names = sorted(n for n in os.listdir(folder) if n.lower().endswith(EXTS))

    def items():
        for n in names:
            with open(osp.join(folder, n), "rb") as f:
                yield n, f.read()

    count = write_pack(out, items())
    print(f"packed {count} images -> {out}")


if __name__ == "__main__":
    main()
