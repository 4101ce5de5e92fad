"""External-framework end-to-end proof: PyTorch PPO training on the
TPU-vectorized engine through the NumPy rim.

The policy/optimizer are plain torch (CPU) — nothing JAX-side is shared;
the environment is :class:`pogema_tpu.PogemaVectorEnv` stepping B envs ×
N agents per call on the accelerator with `obs_layout='packed'`
(matmul-ready flat [B*N, 3*W*W] rows feed the torch MLP directly). This
is the consumption pattern an external SampleFactory/CleanRL user has:
their learner, our engine, NumPy at the boundary.

  python examples/train_torch_ppo.py --envs 256 --agents 4 --size 12 \
      --iters 40
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--agents", type=int, default=4)
    ap.add_argument("--size", type=int, default=12)
    ap.add_argument("--obs-radius", type=int, default=3)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--rollout-steps", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--gae-lambda", type=float, default=0.95)
    ap.add_argument("--clip", type=float, default=0.2)
    ap.add_argument("--entropy-coef", type=float, default=0.01)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--on-target", default="restart")
    ap.add_argument("--cpu-env", action="store_true",
                    help="force the env onto host XLA (CI smoke)")
    args = ap.parse_args(argv)

    import numpy as np
    import torch
    import torch.nn as nn

    from pogema_tpu import GridConfig, PogemaVectorEnv

    torch.manual_seed(0)
    env = PogemaVectorEnv(
        GridConfig(seed=0, size=args.size, num_agents=args.agents,
                   obs_radius=args.obs_radius, max_episode_steps=64,
                   on_target=args.on_target),
        num_vec_envs=args.envs, obs_layout="packed",
        auto_reset_mode="cached",
        device="cpu" if args.cpu_env else "auto")
    obs_dim = env.single_observation_space.shape[0]
    n_act = env.single_action_space.n
    slots = env.num_envs  # B*N agent slots

    class ActorCritic(nn.Module):
        def __init__(self):
            super().__init__()
            self.trunk = nn.Sequential(
                nn.Linear(obs_dim, args.hidden), nn.ReLU(),
                nn.Linear(args.hidden, args.hidden), nn.ReLU())
            self.pi = nn.Linear(args.hidden, n_act)
            self.v = nn.Linear(args.hidden, 1)

        def forward(self, x):
            h = self.trunk(x)
            return self.pi(h), self.v(h).squeeze(-1)

    model = ActorCritic()
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)

    obs, _ = env.reset(seed=0)
    obs = torch.as_tensor(obs, dtype=torch.float32)
    T = args.rollout_steps
    for it in range(args.iters):
        t0 = time.perf_counter()
        b_obs = torch.empty((T, slots, obs_dim))
        b_act = torch.empty((T, slots), dtype=torch.long)
        b_logp = torch.empty((T, slots))
        b_val = torch.empty((T, slots))
        b_rew = torch.empty((T, slots))
        b_done = torch.empty((T, slots))
        metric_sum, metric_n = 0.0, 0
        for t in range(T):
            with torch.no_grad():
                logits, value = model(obs)
                dist = torch.distributions.Categorical(logits=logits)
                act = dist.sample()
                logp = dist.log_prob(act)
            nobs, rew, term, trunc, infos = env.step(act.numpy())
            b_obs[t], b_act[t], b_logp[t], b_val[t] = obs, act, logp, value
            b_rew[t] = torch.as_tensor(rew)
            done = np.logical_or(term, trunc)
            b_done[t] = torch.as_tensor(done, dtype=torch.float32)
            if "metrics/ep_length" in infos:
                mask = infos["_metrics"]
                key = ("metrics/avg_throughput"
                       if "metrics/avg_throughput" in infos
                       else "metrics/ISR")
                metric_sum += float(infos[key][mask].sum())
                metric_n += int(mask.sum())
            obs = torch.as_tensor(nobs, dtype=torch.float32)

        with torch.no_grad():
            _, last_val = model(obs)
        adv = torch.zeros_like(b_rew)
        gae = torch.zeros(slots)
        for t in reversed(range(T)):
            nxt = last_val if t == T - 1 else b_val[t + 1]
            mask = 1.0 - b_done[t]
            delta = b_rew[t] + args.gamma * nxt * mask - b_val[t]
            gae = delta + args.gamma * args.gae_lambda * mask * gae
            adv[t] = gae
        ret = adv + b_val

        flat = lambda x: x.reshape(T * slots, *x.shape[2:])  # noqa: E731
        f_obs, f_act = flat(b_obs), flat(b_act)
        f_logp, f_adv, f_ret = flat(b_logp), flat(adv), flat(ret)
        f_adv = (f_adv - f_adv.mean()) / (f_adv.std() + 1e-8)
        n = T * slots
        mb = n // args.minibatches
        stats = {}
        for _ in range(args.epochs):
            perm = torch.randperm(n)
            for k in range(args.minibatches):
                idx = perm[k * mb:(k + 1) * mb]
                logits, value = model(f_obs[idx])
                dist = torch.distributions.Categorical(logits=logits)
                ratio = torch.exp(dist.log_prob(f_act[idx]) - f_logp[idx])
                a = f_adv[idx]
                pg = -torch.min(
                    ratio * a,
                    torch.clamp(ratio, 1 - args.clip, 1 + args.clip) * a,
                ).mean()
                v_loss = 0.5 * (value - f_ret[idx]).pow(2).mean()
                ent = dist.entropy().mean()
                loss = pg + v_loss - args.entropy_coef * ent
                opt.zero_grad()
                loss.backward()
                nn.utils.clip_grad_norm_(model.parameters(), 0.5)
                opt.step()
                stats = {"loss": float(loss), "entropy": float(ent),
                         "v_loss": float(v_loss)}
        dt = time.perf_counter() - t0
        sps = T * args.envs / dt
        metric = metric_sum / max(metric_n, 1)
        print(f"iter {it:3d}  reward/step {float(b_rew.mean()):.4f}  "
              f"ep_metric {metric:.3f}  loss {stats['loss']:.4f}  "
              f"entropy {stats['entropy']:.3f}  {sps:,.0f} env-steps/s",
              flush=True)
    return float(b_rew.mean())


if __name__ == "__main__":
    main()
