# Developer entry points. The smoke gate is MANDATORY before any commit
# touching crnn_ocr_tpu/ (CLAUDE.md); `make install-hooks` enforces it.

.PHONY: smoke test native install-hooks bench

# Fast suite (beam/greedy parity, predictor, CTC fast goldens, kernel fast
# cases — every test class that caught a shipped regression). Stamps the
# staged tree so the pre-commit hook doesn't re-run an already-green tree.
smoke:
	@GIT_DIR=$$(git rev-parse --git-dir 2>/dev/null); \
	  if [ -n "$$GIT_DIR" ] && [ ! -x "$$GIT_DIR/hooks/pre-commit" ]; then \
	    echo "[smoke-gate] WARNING: $$GIT_DIR/hooks/pre-commit is ABSENT —" \
	         "the gate is NOT enforced. Run 'make install-hooks' now." >&2; \
	  fi
	python -m pytest tests/ -m "not slow" -q
	@GIT_DIR=$$(git rev-parse --git-dir 2>/dev/null) && \
	  git write-tree > "$$GIT_DIR/smoke-pass" 2>/dev/null && \
	  echo "[smoke-gate] stamped $$(cat $$GIT_DIR/smoke-pass)" || true

# Full hermetic suite (8-device CPU mesh; ~30 min on this 1-core box).
test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C crnn_ocr_tpu/native

install-hooks:
	install -m 755 scripts/pre-commit .git/hooks/pre-commit
	@echo "pre-commit smoke gate installed"

bench:
	python bench.py
