"""BN stat re-estimation: refreshed running stats must equal the exact
pooled moments of the dataset (the quantity torch.optim.swa_utils.update_bn
converges to)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from glenet_tpu.models.layers import MaskedBatchNorm
from glenet_tpu.train.bn_refresh import refresh_batch_stats


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        h = nn.Dense(5, name='d0')(x)
        h = MaskedBatchNorm(name='bn0')(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Dense(3, name='d1')(h)
        h = MaskedBatchNorm(name='bn1')(h, use_running_average=not train)
        return h


def test_refresh_matches_pooled_moments():
    net = TinyNet()
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(8, 4) * (i + 1) + i, jnp.float32)
               for i in range(4)]
    variables = net.init(jax.random.PRNGKey(0), batches[0], train=True)
    momentum = 0.01

    def stats_fn(v, b):
        _, new_state = net.apply(v, b, train=True, mutable=['batch_stats'])
        return new_state['batch_stats']

    refreshed = refresh_batch_stats(dict(variables), batches, stats_fn,
                                    momentum)

    # oracle: run the first Dense on the pooled data, take exact moments
    params = variables['params']
    pooled = np.concatenate([np.asarray(b) for b in batches])
    h = pooled @ np.asarray(params['d0']['kernel'])
    want_mean = h.mean(0)
    want_var = h.var(0)
    got = refreshed['batch_stats']['bn0']
    np.testing.assert_allclose(got['mean'], want_mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got['var'], want_var, rtol=1e-4, atol=1e-4)

    # eval forward with refreshed stats must track train-mode normalization:
    # single-batch dataset -> eval == train exactly
    single = [batches[0]]
    refreshed1 = refresh_batch_stats(dict(variables), single, stats_fn,
                                     momentum)
    y_train = net.apply(variables, batches[0], train=True,
                        mutable=['batch_stats'])[0]
    y_eval = net.apply({'params': params,
                        'batch_stats': refreshed1['batch_stats']},
                       batches[0], train=False)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_train),
                               rtol=1e-4, atol=1e-4)


def test_refresh_no_batch_stats_is_identity():
    variables = {'params': {'w': jnp.ones(3)}}
    out = refresh_batch_stats(variables, [jnp.ones(2)],
                              lambda v, b: {}, 0.01)
    assert out is variables
