"""Dataset statistics CLI — the ``get_dataset_samples_and_statistics`` UX
(``Person-ReID/datasetUtils.py:309-366``): tabulated per-split sample /
identity / camera counts for one or more registered datasets.

Example:
    python -m daliid_tpu.cli.stats --targets Market Duke --data_root /data
"""

from __future__ import annotations

import argparse

from daliid_tpu.data.registry import dataset_statistics


def main(argv=None):
    p = argparse.ArgumentParser(description="DaliID-TPU dataset statistics")
    p.add_argument("--targets", type=str, nargs="+", required=True)
    p.add_argument("--data_root", type=str, default=None)
    args = p.parse_args(argv)
    table = dataset_statistics(args.targets, root=args.data_root)
    print(table)
    return table


if __name__ == "__main__":
    main()
