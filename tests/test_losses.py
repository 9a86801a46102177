import jax
import jax.numpy as jnp
import numpy as np

from epos_tpu.train import losses

NUM_OBJS = 3
NUM_FRAGS = 4
H = W = 4


def rng(i=0):
  return np.random.default_rng(i)


def test_obj_cls_loss_matches_manual():
  r = rng(0)
  logits = jnp.asarray(r.normal(size=(1, H, W, NUM_OBJS + 1)), jnp.float32)
  targets = jnp.asarray(r.integers(0, NUM_OBJS + 1, size=(1, H, W)))
  loss = losses.obj_cls_loss(logits, targets)
  # Manual CE averaged over all pixels.
  lp = jax.nn.log_softmax(logits, -1)
  manual = -np.mean([lp[0, y, x, targets[0, y, x]]
                     for y in range(H) for x in range(W)])
  np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


def test_obj_cls_loss_ignore_label():
  r = rng(1)
  logits = jnp.asarray(r.normal(size=(1, H, W, NUM_OBJS + 1)), jnp.float32)
  targets = np.full((1, H, W), 255)
  targets[0, 0, 0] = 1
  loss = losses.obj_cls_loss(logits, jnp.asarray(targets))
  lp = jax.nn.log_softmax(logits, -1)
  # Only one valid pixel contributes; mean over ALL pixels (reference
  # semantics, loss.py:149).
  manual = -float(lp[0, 0, 0, 1]) / (H * W)
  np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


def make_frag_inputs(seed=2, top_k=1):
  r = rng(seed)
  logits_conf = jnp.asarray(
      r.normal(size=(1, H, W, NUM_OBJS * NUM_FRAGS)), jnp.float32)
  logits_loc = jnp.asarray(
      r.normal(size=(1, H, W, NUM_OBJS * NUM_FRAGS * 3)), jnp.float32)
  obj_label = np.zeros((1, H, W), np.int32)
  obj_label[0, 0, 0] = 2   # fg pixel, cls idx 1
  obj_label[0, 1, 1] = 255  # ignored
  obj_label[0, 2, 2] = 3   # fg pixel, cls idx 2
  frag_t = jnp.asarray(r.integers(0, NUM_FRAGS, size=(1, H, W, top_k)))
  frag_w = jnp.ones((1, H, W, top_k), jnp.float32)
  loc_t = jnp.asarray(r.normal(size=(1, H, W, top_k, 3)), jnp.float32)
  return logits_conf, logits_loc, jnp.asarray(obj_label), frag_t, frag_w, loc_t


def test_frag_cls_loss_manual():
  lc, _, obj, ft, fw, _ = make_frag_inputs()
  loss = losses.frag_cls_loss(lc, ft, fw, obj, NUM_OBJS, NUM_FRAGS)
  lc5 = np.asarray(lc).reshape(1, H, W, NUM_OBJS, NUM_FRAGS)
  total = 0.0
  for (y, x, cls) in [(0, 0, 1), (2, 2, 2)]:
    lp = jax.nn.log_softmax(jnp.asarray(lc5[0, y, x, cls]))
    total += -float(lp[int(ft[0, y, x, 0])])
  np.testing.assert_allclose(float(loss), total / 2, rtol=1e-5)


def test_frag_cls_loss_no_fg_is_zero():
  lc, _, _, ft, fw, _ = make_frag_inputs()
  obj = jnp.zeros((1, H, W), jnp.int32)
  loss = losses.frag_cls_loss(lc, ft, fw, obj, NUM_OBJS, NUM_FRAGS)
  assert float(loss) == 0.0 and np.isfinite(float(loss))


def test_frag_loc_loss_manual():
  _, ll, obj, ft, fw, lt = make_frag_inputs()
  loss = losses.frag_loc_loss(ll, ft, fw, lt, obj, NUM_OBJS, NUM_FRAGS)
  ll6 = np.asarray(ll).reshape(1, H, W, NUM_OBJS, NUM_FRAGS, 3)
  total = 0.0
  for (y, x, cls) in [(0, 0, 1), (2, 2, 2)]:
    fid = int(ft[0, y, x, 0])
    pred = ll6[0, y, x, cls, fid]
    tgt = np.asarray(lt[0, y, x, 0])
    d = pred - tgt
    h = np.where(np.abs(d) <= 1, 0.5 * d * d, np.abs(d) - 0.5)
    total += h.sum()
  np.testing.assert_allclose(float(loss), total / (2 * 3), rtol=1e-5)


def test_frag_loc_loss_weighting():
  _, ll, obj, ft, fw, lt = make_frag_inputs()
  half = fw * 0.5
  l1 = losses.frag_loc_loss(ll, ft, fw, lt, obj, NUM_OBJS, NUM_FRAGS)
  l2 = losses.frag_loc_loss(ll, ft, half, lt, obj, NUM_OBJS, NUM_FRAGS)
  np.testing.assert_allclose(float(l2), float(l1) * 0.5, rtol=1e-5)


def test_huber():
  x = jnp.array([-2.0, -1.0, 0.0, 0.5, 1.0, 3.0])
  out = np.asarray(losses.huber(x))
  np.testing.assert_allclose(out, [1.5, 0.5, 0.0, 0.125, 0.5, 2.5])


def test_losses_jit_and_grad():
  lc, ll, obj, ft, fw, lt = make_frag_inputs()

  def f(lc, ll):
    return (losses.frag_cls_loss(lc, ft, fw, obj, NUM_OBJS, NUM_FRAGS) +
            losses.frag_loc_loss(ll, ft, fw, lt, obj, NUM_OBJS, NUM_FRAGS))

  g = jax.jit(jax.grad(f, argnums=(0, 1)))(lc, ll)
  assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
  # Gradients flow only through fg pixels' logits.
  glc = np.asarray(g[0]).reshape(1, H, W, NUM_OBJS, NUM_FRAGS)
  assert np.abs(glc[0, 3, 3]).sum() == 0.0
  assert np.abs(glc[0, 0, 0, 1]).sum() > 0.0


def test_frag_losses_topk3():
  """gt_knn_frags > 1: each of the top-k target fragments contributes a row
  (reference loss.py:186-224 tiling semantics)."""
  r = rng(5)
  top_k = 3
  lc = jnp.asarray(r.normal(size=(1, H, W, NUM_OBJS * NUM_FRAGS)),
                   jnp.float32)
  ll = jnp.asarray(r.normal(size=(1, H, W, NUM_OBJS * NUM_FRAGS * 3)),
                   jnp.float32)
  obj = np.zeros((1, H, W), np.int32)
  obj[0, 0, 0] = 1
  ft = jnp.asarray(r.integers(0, NUM_FRAGS, size=(1, H, W, top_k)))
  fw = jnp.ones((1, H, W, top_k), jnp.float32)
  lt = jnp.asarray(r.normal(size=(1, H, W, top_k, 3)), jnp.float32)

  loss_cls = losses.frag_cls_loss(lc, ft, fw, jnp.asarray(obj),
                                  NUM_OBJS, NUM_FRAGS)
  loss_loc = losses.frag_loc_loss(ll, ft, fw, lt, jnp.asarray(obj),
                                  NUM_OBJS, NUM_FRAGS)
  # Manual: mean over the top_k rows of the single fg pixel (cls idx 0).
  lc5 = np.asarray(lc).reshape(1, H, W, NUM_OBJS, NUM_FRAGS)
  lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lc5[0, 0, 0, 0])))
  manual_cls = -np.mean([lp[int(ft[0, 0, 0, k])] for k in range(top_k)])
  np.testing.assert_allclose(float(loss_cls), manual_cls, rtol=1e-5)

  ll6 = np.asarray(ll).reshape(1, H, W, NUM_OBJS, NUM_FRAGS, 3)
  hs = []
  for k in range(top_k):
    d = ll6[0, 0, 0, 0, int(ft[0, 0, 0, k])] - np.asarray(lt[0, 0, 0, k])
    hs.append(np.where(np.abs(d) <= 1, 0.5 * d * d, np.abs(d) - 0.5))
  manual_loc = np.mean(hs)
  np.testing.assert_allclose(float(loss_loc), manual_loc, rtol=1e-5)
