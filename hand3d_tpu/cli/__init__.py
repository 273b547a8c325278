"""Command-line entry points mirroring the reference's top-level scripts.

  python -m hand3d_tpu.cli.demo               <- run.py
  python -m hand3d_tpu.cli.eval2d_gt_cropped  <- eval2d_gt_cropped.py
  python -m hand3d_tpu.cli.eval2d             <- eval2d.py
  python -m hand3d_tpu.cli.eval3d             <- eval3d.py
  python -m hand3d_tpu.cli.eval_full          <- eval_full.py
  python -m hand3d_tpu.cli.train_handsegnet   <- training_handsegnet.py
  python -m hand3d_tpu.cli.train_posenet      <- training_posenet.py
  python -m hand3d_tpu.cli.train_lifting      <- training_lifting.py

Each is a thin argparse wrapper over library functions; configuration is
explicit flags instead of module-level constants.
"""
