"""The reference's full experiment-config zoo as preset data.

Every file under ``deps/score_sde_pytorch/configs/{vp,ve,subvp}/`` resolved
to one flat entry (39 experiments).  Values were extracted by executing the
reference config files (``get_default_configs()`` + per-file overrides) and
keeping the fields this framework consumes; the test suite re-derives them
from the reference tree and asserts equality field by field
(``tests/test_configs_zoo.py``).

Names are the reference-relative paths without extension, e.g.
``vp/cifar10_ddpmpp_continuous`` <- ``configs/vp/cifar10_ddpmpp_continuous.py``.
One upstream quirk is preserved faithfully: ``ve/ncsn/*`` files set
``training.continuouse`` (sic) and never ``training.sde`` (NCSNv1 predates
the SDE framing); they are mapped to ``sde="vesde", continuous=False``.
"""

# fmt: off
ZOO = {
    'subvp/cifar10_ddpm_continuous': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, sigma_min=0.01, sigma_max=50, num_scales=1000),
        training=dict(sde='subvpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'subvp/cifar10_ddpmpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=False, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='none', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='subvpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'subvp/cifar10_ddpmpp_deep_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=8, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=False, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='none', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='subvpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=950001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'subvp/cifar10_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='subvpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'subvp/cifar10_ncsnpp_deep_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=8, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='subvpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=950001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    've/bedroom_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='output_skip', progressive_input='input_skip', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=256, num_channels=3, centered=False, num_train_timesteps=2000),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=2400001, batch_size=64, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=378, num_scales=2000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.075, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='lsun', image_size=256, num_channels=3, centered=False, random_flip=True),
    ),
    've/celeba_ncsnpp': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='positional', init_scale=0.0, scale_by_sigma=True, image_size=64, num_channels=3, centered=False, num_train_timesteps=1000),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=90.0, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.17, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='celeba', image_size=64, num_channels=3, centered=False, random_flip=True),
    ),
    've/celebahq_256_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='output_skip', progressive_input='input_skip', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=256, num_channels=3, centered=False, num_train_timesteps=2000),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=2400001, batch_size=64, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=348, num_scales=2000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.075, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='celebahq', image_size=256, num_channels=3, centered=False, random_flip=True),
    ),
    've/celebahq_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=16, ch_mult=(1, 2, 4, 8, 16, 32, 32, 32), num_res_blocks=1, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='output_skip', progressive_input='input_skip', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=1024, num_channels=3, centered=False, num_train_timesteps=2000),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=2400001, batch_size=8, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=1348, num_scales=2000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.15, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='celebahq', image_size=1024, num_channels=3, centered=False, random_flip=True),
    ),
    've/church_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='output_skip', progressive_input='input_skip', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=256, num_channels=3, centered=False, num_train_timesteps=2000),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=2400001, batch_size=64, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=380, num_scales=2000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.075, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='lsun', image_size=256, num_channels=3, centered=False, random_flip=True),
    ),
    've/cifar10_ddpm': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, scale_by_sigma=True, image_size=32, num_channels=3, centered=False, sigma_min=0.01, sigma_max=50, num_scales=1000),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/cifar10_ncsnpp': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='positional', init_scale=0.0, scale_by_sigma=True, image_size=32, num_channels=3, centered=False, num_train_timesteps=1000),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/cifar10_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=32, num_channels=3, centered=False, num_train_timesteps=1000),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/cifar10_ncsnpp_deep_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=8, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=32, num_channels=3, centered=False, num_train_timesteps=1000),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=950001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/ffhq_256_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='output_skip', progressive_input='input_skip', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=256, num_channels=3, centered=False, num_train_timesteps=2000),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=2400001, batch_size=64, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=348, num_scales=2000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.075, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='ffhq', image_size=256, num_channels=3, centered=False, random_flip=True),
    ),
    've/ffhq_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=16, ch_mult=(1, 2, 4, 8, 16, 32, 32, 32), num_res_blocks=1, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='output_skip', progressive_input='input_skip', progressive_combine='sum', embedding_type='fourier', fourier_scale=16, init_scale=0.0, scale_by_sigma=True, image_size=1024, num_channels=3, centered=False, num_train_timesteps=2000),
        training=dict(sde='vesde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=2400001, batch_size=8, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=1348, num_scales=2000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='langevin', snr=0.15, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='ffhq', image_size=1024, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/celeba': dict(
        family='ncsn',
        model=dict(nf=128, image_size=64, num_channels=3, centered=False, sigma_min=0.01, sigma_max=1.0, num_scales=10),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.0, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=1.0, num_scales=10, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.316, n_steps_each=100, noise_removal=True, probability_flow=False),
        data=dict(dataset='celeba', image_size=64, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/celeba_124': dict(
        family='ncsn',
        model=dict(nf=128, image_size=64, num_channels=3, centered=False, sigma_min=0.01, sigma_max=90.0, num_scales=500),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.0, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=90.0, num_scales=500, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.128, n_steps_each=5, noise_removal=True, probability_flow=False),
        data=dict(dataset='celeba', image_size=64, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/celeba_1245': dict(
        family='ncsn',
        model=dict(nf=128, image_size=64, num_channels=3, centered=False, sigma_min=0.01, sigma_max=90.0, num_scales=500),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=90.0, num_scales=500, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.128, n_steps_each=5, noise_removal=True, probability_flow=False),
        data=dict(dataset='celeba', image_size=64, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/celeba_5': dict(
        family='ncsn',
        model=dict(nf=128, image_size=64, num_channels=3, centered=False, sigma_min=0.01, sigma_max=1.0, num_scales=10),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=1.0, num_scales=10, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.316, n_steps_each=100, noise_removal=True, probability_flow=False),
        data=dict(dataset='celeba', image_size=64, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/cifar10': dict(
        family='ncsn',
        model=dict(nf=128, image_size=32, num_channels=3, centered=False, sigma_min=0.01, sigma_max=1, num_scales=10),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.0, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=1, num_scales=10, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.316, n_steps_each=100, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/cifar10_124': dict(
        family='ncsn',
        model=dict(nf=128, image_size=32, num_channels=3, centered=False, sigma_min=0.01, sigma_max=50, num_scales=232),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.0, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=232, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.176, n_steps_each=5, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/cifar10_1245': dict(
        family='ncsn',
        model=dict(nf=128, image_size=32, num_channels=3, centered=False, sigma_min=0.01, sigma_max=50, num_scales=232),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=232, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.176, n_steps_each=5, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsn/cifar10_5': dict(
        family='ncsn',
        model=dict(nf=128, image_size=32, num_channels=3, centered=False, sigma_min=0.01, sigma_max=1, num_scales=10),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=1, num_scales=10, lr=0.001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.316, n_steps_each=100, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsnv2/bedroom': dict(
        family='ncsnv2_128',
        model=dict(nf=128, image_size=128, num_channels=3, centered=False, sigma_min=0.01, sigma_max=190, num_scales=1086),
        training=dict(sde='vesde', continuous=True, reduce_mean=False, likelihood_weighting=False, n_iters=2400001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=190, num_scales=1086, lr=0.0001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.095, n_steps_each=3, noise_removal=True, probability_flow=False),
        data=dict(dataset='lsun', image_size=128, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsnv2/celeba': dict(
        family='ncsnv2_64',
        model=dict(nf=128, image_size=64, num_channels=3, centered=False, sigma_min=0.01, sigma_max=90.0, num_scales=500),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=90.0, num_scales=500, lr=0.0001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.128, n_steps_each=5, noise_removal=True, probability_flow=False),
        data=dict(dataset='celeba', image_size=64, num_channels=3, centered=False, random_flip=True),
    ),
    've/ncsnv2/cifar10': dict(
        family='ncsnv2_64',
        model=dict(nf=128, image_size=32, num_channels=3, centered=False, sigma_min=0.01, sigma_max=50, num_scales=232),
        training=dict(sde='vesde', continuous=False, reduce_mean=False, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=232, lr=0.0001, warmup=0, grad_clip=-1.0),
        sampling=dict(method='pc', predictor='none', corrector='ald', snr=0.176, n_steps_each=5, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=False, random_flip=True),
    ),
    'vp/cifar10_ddpmpp': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=False, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='none', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='vpsde', continuous=False, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='ancestral_sampling', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/cifar10_ddpmpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=False, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='none', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='vpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/cifar10_ddpmpp_deep_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=8, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=False, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='none', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='vpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=950001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/cifar10_ncsnpp': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='positional', init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='vpsde', continuous=False, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='reverse_diffusion', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/cifar10_ncsnpp_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=4, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='vpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/cifar10_ncsnpp_deep_continuous': dict(
        family='ncsnpp',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=8, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, fir=True, fir_kernel=(1, 3, 3, 1), skip_rescale=True, resblock_type='biggan', progressive='none', progressive_input='residual', progressive_combine='sum', embedding_type='positional', fourier_scale=16, init_scale=0.0, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, num_train_timesteps=1000),
        training=dict(sde='vpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=950001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/ddpm/bedroom': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, scale_by_sigma=False, image_size=256, num_channels=3, centered=True, sigma_min=0.01, sigma_max=378, num_scales=1000),
        training=dict(sde='vpsde', continuous=False, reduce_mean=True, likelihood_weighting=False, n_iters=2400001, batch_size=64, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=378, num_scales=1000, lr=2e-05, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='ancestral_sampling', corrector='none', snr=0.075, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='lsun', image_size=256, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/ddpm/celebahq': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, scale_by_sigma=False, image_size=256, num_channels=3, centered=True, sigma_min=0.01, sigma_max=378, num_scales=1000),
        training=dict(sde='vpsde', continuous=False, reduce_mean=True, likelihood_weighting=False, n_iters=2400001, batch_size=64, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=378, num_scales=1000, lr=2e-05, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='ancestral_sampling', corrector='none', snr=0.075, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='celebahq', image_size=256, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/ddpm/church': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2, attn_resolutions=(16,), dropout=0.0, resamp_with_conv=True, conditional=True, scale_by_sigma=False, image_size=256, num_channels=3, centered=True, sigma_min=0.01, sigma_max=378, num_scales=1000),
        training=dict(sde='vpsde', continuous=False, reduce_mean=True, likelihood_weighting=False, n_iters=2400001, batch_size=64, snapshot_freq=50000, snapshot_freq_for_preemption=5000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=378, num_scales=1000, lr=2e-05, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='ancestral_sampling', corrector='none', snr=0.075, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='lsun', image_size=256, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/ddpm/cifar10': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, sigma_min=0.01, sigma_max=50, num_scales=1000),
        training=dict(sde='vpsde', continuous=False, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='ancestral_sampling', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/ddpm/cifar10_continuous': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=True, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, sigma_min=0.01, sigma_max=50, num_scales=1000),
        training=dict(sde='vpsde', continuous=True, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='euler_maruyama', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
    'vp/ddpm/cifar10_unconditional': dict(
        family='ddpm',
        model=dict(nf=128, ch_mult=(1, 2, 2, 2), num_res_blocks=2, attn_resolutions=(16,), dropout=0.1, resamp_with_conv=True, conditional=False, scale_by_sigma=False, image_size=32, num_channels=3, centered=True, sigma_min=0.01, sigma_max=50, num_scales=1000),
        training=dict(sde='vpsde', continuous=False, reduce_mean=True, likelihood_weighting=False, n_iters=1300001, batch_size=128, snapshot_freq=50000, snapshot_freq_for_preemption=10000, ema_rate=0.9999, beta_min=0.1, beta_max=20.0, sigma_min=0.01, sigma_max=50, num_scales=1000, lr=0.0002, warmup=5000, grad_clip=1.0),
        sampling=dict(method='pc', predictor='ancestral_sampling', corrector='none', snr=0.16, n_steps_each=1, noise_removal=True, probability_flow=False),
        data=dict(dataset='cifar10', image_size=32, num_channels=3, centered=True, random_flip=True),
    ),
}
# fmt: on
