"""Optimizer + LR-schedule registry (optax).

Parity with /root/reference/train.py:374-396: {sgd, momentum, rmsprop,
adam} with the same default hyperparameters and an exponential-decay
learning rate (staircase by default).
"""

from typing import Optional

import optax


def exponential_decay_lr(
    initial_lr: float,
    decay_step: int,
    decay_factor: float,
    is_staircase: bool = True,
):
    return optax.exponential_decay(
        init_value=initial_lr,
        transition_steps=decay_step,
        decay_rate=decay_factor,
        staircase=is_staircase,
    )


_DEFAULT_KWARGS = {
    "sgd": {},
    "momentum": {"momentum": 0.9},
    "rmsprop": {"momentum": 0.9, "decay": 0.9, "epsilon": 1.0},
    "adam": {},
}


def build_optimizer(
    name: str,
    learning_rate,
    optimizer_kwargs: Optional[dict] = None,
) -> optax.GradientTransformation:
    kwargs = dict(_DEFAULT_KWARGS[name])
    kwargs.update(optimizer_kwargs or {})
    if name == "sgd":
        return optax.sgd(learning_rate, **kwargs)
    if name == "momentum":
        return optax.sgd(learning_rate, momentum=kwargs["momentum"])
    if name == "rmsprop":
        return optax.rmsprop(
            learning_rate,
            decay=kwargs["decay"],
            eps=kwargs["epsilon"],
            momentum=kwargs["momentum"],
        )
    if name == "adam":
        return optax.adam(learning_rate, **kwargs)
    raise ValueError("unknown optimizer: %s" % name)


def build_from_train_config(train_config: dict):
    lr = exponential_decay_lr(
        train_config["initial_lr"],
        train_config["decay_step"],
        train_config["decay_factor"],
        train_config.get("is_staircase", True),
    )
    opt = build_optimizer(
        train_config["optimizer"],
        lr,
        train_config.get("optimizer_kwargs"),
    )
    if (
        train_config.get("is_pseudo_batch", False)
        and train_config.get("pseudo_batch_factor", 0) > 1
    ):
        # gradient accumulation ("pseudo batch", train.py:559-575);
        # the reference defaults is_pseudo_batch to False
        # (train.py:559), so a config carrying only a factor does NOT
        # accumulate — match that exactly
        opt = optax.MultiSteps(
            opt, every_k_schedule=train_config["pseudo_batch_factor"]
        )
    return opt, lr
