"""Gradio web UI — reference ``app.py`` equivalent.

Widget-for-widget port of the reference Blocks UI
(``/root/reference/app.py:198-277``): run-type radio, control-type radio
with dynamic visibility (``:222-224``), sentence-length/iteration/sample
sliders, alpha/beta/gamma, and two output boxes (final + best captions)
joined by ``format_output`` (``utils.py:61-74``).

Divergence (documented in PARITY.md): the reference reloads BOTH models on
every Submit (``app.py:152-159``); here the models load once and requests
reuse the compiled engine — the jit cache makes repeat requests with the
same shape configuration near-instant.
"""

from __future__ import annotations

import argparse

from conzic_tpu.config import (
    ConzicConfig,
    DEFAULT_POS_TEMPLATE,
    config_from_args,
)
from conzic_tpu.engine.sampler import control_generate_caption, generate_caption
from conzic_tpu.runtime.logging import null_logger
from conzic_tpu.runtime.seeding import set_seed


def format_output(sample_num, final_caption, best_caption):
    """Join 1..N samples with newlines (utils.py:61-74)."""
    n = max(1, min(int(sample_num), len(final_caption)))
    return "\n".join(final_caption[:n]), "\n".join(best_caption[:n])


def make_demo_fn(captioner, cfg: ConzicConfig):
    logger = null_logger()

    def demo(run_type, control_type, sentiment_type, order, prompt,
             sentence_len, num_iterations, samples_num, alpha, beta, gamma,
             image):
        rng = set_seed(cfg.seed)
        finals, bests = [], []
        image_embeds = captioner.encode_images([image])
        for _ in range(int(samples_num)):
            if run_type == "caption":
                texts, _ = generate_caption(
                    ["app"], captioner, image_embeds, logger,
                    prompt=prompt, batch_size=1, max_len=int(sentence_len),
                    top_k=cfg.candidate_k, temperature=cfg.lm_temperature,
                    max_iter=int(num_iterations), alpha=alpha, beta=beta,
                    generate_order=order, rng=rng,
                )
            else:
                texts, _ = control_generate_caption(
                    ["app"], captioner, image_embeds, logger,
                    prompt=prompt, batch_size=1, max_len=int(sentence_len),
                    top_k=cfg.candidate_k, temperature=cfg.lm_temperature,
                    max_iter=int(num_iterations), alpha=alpha, beta=beta,
                    gamma=gamma, ctl_type=control_type,
                    style_type=sentiment_type,
                    pos_type=DEFAULT_POS_TEMPLATE,
                    generate_order=order, rng=rng,
                )
            finals.append(texts[-2][0])
            bests.append(texts[-1][0])
        return format_output(samples_num, finals, bests)

    return demo


def control_widgets_visible(run_type: str) -> bool:
    """Control-type widgets appear only for controllable runs
    (reference RunTypeChange, app.py:185-190)."""
    return run_type == "controllable"


def sentiment_widget_visible(control_type: str) -> bool:
    """Sentiment radio appears only for sentiment control
    (reference ControlTypeChange, app.py:192-196)."""
    return control_type == "sentiment"


def reset_values():
    """Widget defaults for the Reset button (reference app.py:264-277)."""
    d = ConzicConfig()
    return ("caption", "sentiment", "positive", "shuffle",
            "Image of a", 10, 10, 2, d.alpha, d.beta, d.gamma)


def build_ui(captioner, cfg: ConzicConfig):
    import gradio as gr

    demo_fn = make_demo_fn(captioner, cfg)
    with gr.Blocks() as ui:
        gr.Markdown("# ConZIC-TPU: Controllable Zero-shot Image Captioning")
        with gr.Row():
            with gr.Column():
                run_type = gr.Radio(["caption", "controllable"],
                                    value="caption", label="Run Type")
                control_type = gr.Radio(["sentiment", "pos"],
                                        value="sentiment", label="Control Type",
                                        visible=False)
                sentiment_type = gr.Radio(["positive", "negative"],
                                          value="positive",
                                          label="Sentiment", visible=False)
                order = gr.Radio(["sequential", "shuffle", "span", "random"],
                                 value="shuffle", label="Generation Order")
                prompt = gr.Textbox(value="Image of a", label="Prompt")
                sentence_len = gr.Slider(5, 15, value=10, step=1,
                                         label="Sentence Length")
                num_iterations = gr.Slider(1, 15, value=10, step=1,
                                           label="Num Iterations")
                samples_num = gr.Slider(1, 5, value=2, step=1,
                                        label="Samples")
                alpha = gr.Slider(0, 1, value=cfg.alpha, step=0.01,
                                  label="Alpha", info="Weight for fluency")
                beta = gr.Slider(1, 5, value=cfg.beta, step=0.5,
                                 label="Beta", info="Weight for image-matching degree")
                gamma = gr.Slider(1, 10, value=cfg.gamma, step=0.5,
                                  label="Gamma", info="weight for controllable degree")
                image = gr.Image(type="pil", label="Upload Picture")
                with gr.Row():
                    submit = gr.Button("Submit")
                    reset = gr.Button("Reset")
            with gr.Column():
                final_out = gr.Textbox(label="Final Caption", lines=5,
                                       placeholder="Final Caption")
                best_out = gr.Textbox(label="Best Caption", lines=5,
                                      placeholder="Best Caption")

        def on_run_type(rt):
            vis = control_widgets_visible(rt)
            return gr.update(visible=vis), gr.update(visible=vis)

        run_type.change(on_run_type, [run_type], [control_type, sentiment_type])

        def on_control_type(ct):
            return gr.update(visible=sentiment_widget_visible(ct))

        control_type.change(on_control_type, [control_type], [sentiment_type])
        submit.click(
            demo_fn,
            [run_type, control_type, sentiment_type, order, prompt,
             sentence_len, num_iterations, samples_num, alpha, beta, gamma,
             image],
            [final_out, best_out],
        )

        def on_reset():
            return reset_values()

        reset.click(
            on_reset, [],
            [run_type, control_type, sentiment_type, order, prompt,
             sentence_len, num_iterations, samples_num, alpha, beta, gamma],
        )
    return ui


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lm_model", default="bert-base-uncased")
    p.add_argument("--match_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--random_models", nargs="?", const="full",
                   choices=["full", "tiny"], default=False)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--device", type=str, default="tpu",
                   choices=["tpu", "cpu", "cuda"],
                   help="cpu forces the CPU backend (functional; required "
                        "for side processes while a bench holds the TPU)")
    p.add_argument("--ui", choices=["auto", "gradio", "fallback"],
                   default="auto",
                   help="auto: gradio when installed, else the stdlib "
                        "fallback server with the same widgets")
    args = p.parse_args(argv)

    use_gradio = args.ui in ("auto", "gradio")
    if use_gradio:
        try:
            import gradio  # noqa: F401
        except ImportError:
            if args.ui == "gradio":
                raise SystemExit(
                    "gradio is not installed; re-run with --ui fallback "
                    "(same widgets, stdlib server) or pip install gradio."
                )
            use_gradio = False

    from conzic_tpu.api.demo import build_captioner

    # config_from_args gives this entry point the same functional
    # --device cpu and persistent-compile-cache behavior as every other
    # CLI (CLAUDE.md rules; it copies lm_model/match_model from args)
    cfg = config_from_args(args)
    captioner = build_captioner(cfg, random_models=args.random_models)
    if use_gradio:
        ui = build_ui(captioner, cfg)
        ui.launch(server_port=args.port)
    else:
        from conzic_tpu.api.fallback_ui import serve

        serve(captioner, cfg, port=args.port)


if __name__ == "__main__":
    main()
