"""Export a training checkpoint dir as a portable pretrained artifact.

Usage: python tools/export_pretrained.py <ckpt_dir> <out_dir>

Writes model_config.json + classes.json + weights.h5 (legacy Keras format,
loadable by both this framework and tf_keras).
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from crnn_ocr_tpu.infer.h5_import import export_keras_h5
    from crnn_ocr_tpu.train import CheckpointManager, load_model_config
    from crnn_ocr_tpu.train.state import create_train_state

    ckpt_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    cfg = load_model_config(ckpt_dir)
    template = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(ckpt_dir)
    params, batch_stats = mgr.restore_inference(
        template.params, template.batch_stats
    )
    export_keras_h5(
        params, batch_stats, cfg, os.path.join(out_dir, "weights.h5")
    )
    shutil.copy(
        os.path.join(ckpt_dir, "model_config.json"),
        os.path.join(out_dir, "model_config.json"),
    )
    shutil.copy(
        os.path.join(ckpt_dir, "classes.json"),
        os.path.join(out_dir, "classes.json"),
    )
    size = os.path.getsize(os.path.join(out_dir, "weights.h5")) / 1e6
    print(f"exported {out_dir} (weights.h5 {size:.1f} MB)")


if __name__ == "__main__":
    main()
