"""Learning-rate schedules as jax-traceable functions of the step counter.

The reference uses stateful torch schedulers stepped once per iteration
(BasicSR/basicsr/models/lr_scheduler.py:6-96 MultiStepRestartLR /
CosineAnnealingRestartLR, plus linear warmup in BaseModel.update_learning_rate
base_model.py:144-165). Here a schedule is a pure ``step -> lr`` function fed
to optax, so it lives inside the jitted train step and is resume-exact by
construction (lr is a function of the restored iter counter).
"""

import jax.numpy as jnp
import numpy as np


def multi_step_restart_lr(base_lr, milestones, gamma=0.1, restarts=(0,),
                          restart_weights=(1,)):
    """lr = base * weight_at_restart * gamma^(#milestones passed since restart).

    With the default single restart at 0 this is torch MultiStepLR — the
    schedule used by every BSVD train config (bsvd_c64_unblind.yml:68-72).
    """
    milestones = np.asarray(sorted(int(m) for m in milestones))
    restarts = np.asarray(sorted(int(r) for r in restarts))
    restart_weights = np.asarray(restart_weights, np.float32)
    assert len(restarts) == len(restart_weights)

    milestones_j = jnp.asarray(milestones)
    restarts_j = jnp.asarray(restarts)
    weights_j = jnp.asarray(restart_weights)

    def schedule(step):
        step = jnp.asarray(step)
        r_idx = jnp.clip(jnp.searchsorted(restarts_j, step, side='right') - 1,
                         0, len(restarts) - 1)
        r_start = restarts_j[r_idx]
        weight = weights_j[r_idx]
        n_passed = jnp.sum((milestones_j > r_start) & (milestones_j <= step))
        return base_lr * weight * jnp.power(gamma, n_passed.astype(jnp.float32))

    return schedule


def cosine_annealing_restart_lr(base_lr, periods, restart_weights=(1,), eta_min=0):
    """Cosine annealing with restarts (reference lr_scheduler.py:44-96)."""
    periods = [int(p) for p in periods]
    assert len(periods) == len(restart_weights)
    cum = np.cumsum([0] + periods)
    cum_j = jnp.asarray(cum)
    weights_j = jnp.asarray(np.asarray(restart_weights, np.float32))
    periods_j = jnp.asarray(np.asarray(periods, np.float32))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # side='left': step == cumulative boundary still belongs to the
        # ENDING period (reference get_position_from_periods uses
        # ``iteration <= period``), so the boundary step reads the fully
        # annealed lr and the restart happens one step later
        idx = jnp.clip(jnp.searchsorted(cum_j[1:], step, side='left'),
                       0, len(periods) - 1)
        start = cum_j[idx].astype(jnp.float32)
        period = periods_j[idx]
        weight = weights_j[idx]
        frac = jnp.clip((step - start) / jnp.maximum(period, 1.0), 0.0, 1.0)
        return eta_min + weight * 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * frac))

    return schedule


def with_warmup(schedule, warmup_iter=-1):
    """Linear warmup from 0 over warmup_iter steps (reference
    base_model.py:144-165: warmup multiplies linearly up to init lr)."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        step_f = jnp.asarray(step, jnp.float32)
        factor = jnp.clip(step_f / float(warmup_iter), 0.0, 1.0)
        return schedule(step) * factor

    return warmed


def build_schedule(train_opt):
    """Build the lr schedule from the YAML ``train:`` block
    (optim_g.lr + scheduler{type,...} + warmup_iter)."""
    base_lr = float(train_opt['optim_g']['lr'])
    sch = dict(train_opt.get('scheduler') or {})
    sch_type = sch.pop('type', 'constant') if sch else 'constant'
    if sch_type in ('MultiStepLR', 'MultiStepRestartLR'):
        schedule = multi_step_restart_lr(
            base_lr, sch.get('milestones', []), sch.get('gamma', 0.1),
            sch.get('restarts', (0,)), sch.get('restart_weights', (1,)))
    elif sch_type == 'CosineAnnealingRestartLR':
        schedule = cosine_annealing_restart_lr(
            base_lr, sch['periods'], sch.get('restart_weights', (1,)),
            sch.get('eta_min', 0))
    elif sch_type == 'constant':
        schedule = lambda step: jnp.asarray(base_lr, jnp.float32)  # noqa: E731
    else:
        raise NotImplementedError(f'scheduler {sch_type!r}')
    return with_warmup(schedule, train_opt.get('warmup_iter', -1))
