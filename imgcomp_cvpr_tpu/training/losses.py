"""Rate-distortion loss composition (ref: train.py:303-336).

total = d_loss_scaled + beta * max(H_soft - H_target, 0) + regularizers
with H_soft = (H_mask + H_real) / 2, H_mask = mean(bc * heatmap),
H_real = mean(bc). Regularizers: L2 on every conv kernel of encoder /
decoder / context model (slim's l2_regularizer = factor * sum(w^2)/2) and
on the quantizer centers (ref: quantizer.py:18-24, probclass.py:90-95).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def l2_of_conv_kernels(params_tree: Any) -> jax.Array:
    """Sum of l2_loss (= sum(w^2)/2) over all conv-kernel leaves named 'w'."""
    total = jnp.zeros((), jnp.float32)

    def visit(tree):
        nonlocal total
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == 'w':
                    leaves = jax.tree_util.tree_leaves(v)
                    for leaf in leaves:
                        total = total + 0.5 * jnp.sum(jnp.square(leaf))
                else:
                    visit(v)
    visit(params_tree)
    return total


def rate_loss(bc: jax.Array, heatmap: Optional[jax.Array], H_target: float,
              beta: float) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    H_real = jnp.mean(bc)
    H_mask = jnp.mean(bc * heatmap) if heatmap is not None else H_real
    H_soft = 0.5 * (H_mask + H_real)
    pc_loss = beta * jnp.maximum(H_soft - H_target, 0.0)
    return pc_loss, {'H_real': H_real, 'H_mask': H_mask, 'H_soft': H_soft,
                     'pc_loss': pc_loss}


def total_loss(ae_config, pc_config, d_loss_scaled: jax.Array, bc: jax.Array,
               heatmap: Optional[jax.Array], ae_params, pc_params,
               centers: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    pc_loss, comps = rate_loss(bc, heatmap, ae_config.H_target, ae_config.beta)

    reg_ae = ae_config.regularization_factor * l2_of_conv_kernels(ae_params)
    reg_centers = (ae_config.regularization_factor_centers or 0.0) * \
        0.5 * jnp.sum(jnp.square(centers))
    pc_factor = pc_config.regularization_factor
    reg_pc = (pc_factor * l2_of_conv_kernels(pc_params)
              if pc_factor else jnp.zeros((), jnp.float32))

    total = d_loss_scaled + pc_loss + reg_ae + reg_centers + reg_pc
    comps.update({'d_loss_scaled': d_loss_scaled, 'reg_ae': reg_ae,
                  'reg_centers': reg_centers, 'reg_pc': reg_pc,
                  'total_loss': total})
    return total, comps
