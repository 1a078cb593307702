"""Manual gradient descent on a random tensor expression.

Parity workload: reference examples/gradient_descent.py -- minimizes
``sum((a.tanh() + b.sigmoid()) @ (c.relu() - a.sigmoid()))`` by hand-rolled
SGD with in-place parameter updates under no_grad.
"""

import sys
import time

sys.path.insert(0, ".")

import lightgrad_tpu as light


def main(epochs: int = 100, lr: float = 0.001):
    a = light.uniform(-1, 1, (64, 64))
    b = light.uniform(-1, 1, (64, 64))
    c = light.uniform(-1, 1, (64, 64))

    t0 = time.perf_counter()
    loss = None
    for _ in range(epochs):
        y = (a.tanh() + b.sigmoid()) @ (c.relu() - a.sigmoid())
        loss = (y * y).sum()
        for p in (a, b, c):
            p.zero_grad()
        loss.backward()
        with light.no_grad():
            for p in (a, b, c):
                p += p.grad * (-lr)
    dt = time.perf_counter() - t0
    print(f"final loss {loss.item():.6f} after {epochs} epochs in {dt:.3f}s")
    return dt


if __name__ == "__main__":
    main()
