"""Optimizers (reference ``initOptimizer``, ``cpc/Train.cpp:569-581``;
``--netoptim/--critoptim`` ∈ sgd|adam|adadelta|adagrad|amsgrad|novograd|
rmsprop, plus momentum/weight-decay/beta/epsilon flags).

Built on optax with injectable learning rate (``setLr`` dynamic updates,
``cpc/Train.cpp:1112-1113`` — here via optax.inject_hyperparams so the LR
can change every step without recompiling).
"""

from __future__ import annotations

import optax


def make_optimizer(
    name: str,
    lr: float,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    rho: float = 0.9,
    max_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    name = name.lower()

    def base(learning_rate):
        if name == "sgd":
            return optax.sgd(learning_rate, momentum=momentum if momentum > 0 else None)
        if name == "adam":
            return optax.adam(learning_rate, b1=beta1, b2=beta2, eps=epsilon)
        if name == "amsgrad":
            return optax.amsgrad(learning_rate, b1=beta1, b2=beta2, eps=epsilon)
        if name == "adagrad":
            return optax.adagrad(learning_rate, eps=epsilon)
        if name == "adadelta":
            return optax.adadelta(learning_rate, rho=rho, eps=epsilon)
        if name == "rmsprop":
            return optax.rmsprop(learning_rate, decay=rho, eps=epsilon, momentum=momentum)
        if name == "novograd":
            return optax.novograd(learning_rate, b1=beta1, b2=beta2, eps=epsilon)
        raise ValueError(f"unknown optimizer: {name}")

    chain = []
    if max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))

    inner = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(*chain, base(learning_rate))
    )(learning_rate=lr)
    return inner


def set_lr(opt_state, lr):
    """Update the injected learning rate in an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
