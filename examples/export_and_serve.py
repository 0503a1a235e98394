"""QAT -> INT8 freeze -> batched serving, end to end.

    python examples/export_and_serve.py [--epochs 2]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="/root/data")
    a = p.parse_args()

    from alignq_tpu.data.registry import get_data
    from alignq_tpu.models import resnet20_quant
    from alignq_tpu.serve import build_int8_resnet20_engine
    from alignq_tpu.train import TrainConfig
    from alignq_tpu.train.loop import fit

    cfg = TrainConfig(
        method="ours", bitW=8, abitW=8, variant="int8",
        dataset=a.dataset, data_dir=a.data_dir, num_epochs=a.epochs,
        train_batch_size=64, eval_batch_size=64,
        job_dir="/tmp/alignq_serve_demo", print_freq=1000,
    )
    data = get_data(cfg.dataset, cfg.data_dir, 64, 64, cfg.seed)
    model = resnet20_quant(bitW=8, abitW=8, method="ours", variant="int8")
    result = fit(cfg, data, model=model)
    state = result["state"]
    print(f"trained: fake-quant top1 {result['best_top1']:.2f}")

    engine = build_int8_resnet20_engine(state.params, state.batch_stats, 64)
    try:
        xb, yb = next(iter(data.loader_test))
        futs = [engine.submit(xb[i : i + 16]) for i in range(0, 64, 16)]
        preds = np.concatenate([f.result().argmax(-1) for f in futs])
        print(f"served INT8 top1 on one batch: {(preds == yb).mean()*100:.1f}%")
    finally:
        engine.close()


if __name__ == "__main__":
    main()
