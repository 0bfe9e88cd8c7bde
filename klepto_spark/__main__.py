from klepto_spark.cli import main

raise SystemExit(main())
