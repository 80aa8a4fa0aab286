"""pymultinest stub."""
